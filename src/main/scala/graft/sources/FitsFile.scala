package graft.sources

import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets

import org.apache.spark.sql.{DataFrame, SparkSession}

/** FITS card-header + binary-table parsing — the reference's own header
  * container (`readfitsheader` dlyfix_fits.py:75, `parsefitshdr` :89,
  * `binarytable` :133, `history_class` :236): 2880-byte blocks of 36
  * fixed-width 80-char cards, END-terminated, COMMENT/HISTORY
  * passthrough cards, `KEY     = value / comment` splitting, and
  * big-endian binary-table rows described by TTYPEn/TFORMn cards.
  *
  * Extensions over the reference (public FITS standard, not copied):
  * typed value coercion (quoted string / T-F logical / integer / float,
  * like [[ParFile]]'s coercion rules) and CONTINUE long-string merging.
  *
  * Scale shape: one file = one parse (headers are KB-sized); the
  * distributed path rides Spark's `binaryFile` source so a million-file
  * archive catalog parses with full cluster parallelism, cards exploding
  * to rows in a pure map stage.
  */
object FitsFile {

  val BlockSize = 2880
  val CardSize = 80

  /** One 80-char card. `raw` is the undecoded value field (everything
    * between `=` and the `/` comment for value cards; the card remainder
    * for COMMENT/HISTORY). */
  final case class FitsCard(key: String, raw: String, comment: Option[String]) {

    /** Quoted FITS string: `'text'` with `''` escaping and trailing-blank
      * trim (leading blanks are significant per the standard). */
    def strValue: Option[String] = {
      val t = raw.trim
      if (t.length >= 2 && t.head == '\'' && t.last == '\'')
        Some(t.substring(1, t.length - 1).replace("''", "'").replaceAll("\\s+$", ""))
      else None
    }

    /** FITS logical: bare `T` / `F`. */
    def boolValue: Option[Boolean] = raw.trim match {
      case "T" => Some(true)
      case "F" => Some(false)
      case _   => None
    }

    def longValue: Option[Long] = raw.trim.toLongOption

    /** Numeric value; FITS allows Fortran `D` exponents (1.0D3). */
    def doubleValue: Option[Double] =
      raw.trim.replace('D', 'E').replace('d', 'e').toDoubleOption
  }

  /** Parse ONE 80-char card image — the per-card production path
    * ([[parseBlock]] delegates here card by card, and q149's
    * [[parseCardColumn]] fans fabricated images through it). Returns
    * None for blank padding and for malformed '='-less lines (the
    * reference prints "BAD LINE" and skips — dlyfix_fits.py:117; we
    * skip silently). Images shorter than 80 chars are blank-padded
    * first (parseBlock always hands exactly 80). */
  def parseCard(image: String): Option[FitsCard] = {
    val line = if (image.length < CardSize) image.padTo(CardSize, ' ') else image
    if (line.startsWith("END") && line.substring(3).trim.isEmpty)
      Some(FitsCard("END", "", None))
    else if (line.startsWith("COMMENT") || line.startsWith("HISTORY") ||
             line.startsWith("CONTINUE")) {
      val key = line.takeWhile(c => c != ' ' && c != '=')
      Some(FitsCard(key, line.substring(key.length + (if (line.charAt(key.length) == '=') 1 else 0)), None))
    } else if (line.trim.nonEmpty) {
      val eq = line.indexOf('=')
      if (eq > 0) {
        val key = line.substring(0, eq).trim
        val rest = line.substring(eq + 1)
        // The / comment separator must sit outside a quoted string.
        var inQuote = false
        var slash = -1
        var j = 0
        while (j < rest.length && slash < 0) {
          val c = rest.charAt(j)
          if (c == '\'') inQuote = !inQuote
          else if (c == '/' && !inQuote) slash = j
          j += 1
        }
        val (v, cm) =
          if (slash >= 0) (rest.substring(0, slash), Some(rest.substring(slash + 1).trim))
          else (rest, None)
        Some(FitsCard(key, v, cm.filter(_.nonEmpty)))
      } else None
    } else None
  }

  /** Parse the 36 cards of one 2880-byte block starting at `off`.
    * Cards after END in the block are blank padding and are dropped
    * (the reference keeps them as key=None blanks; we have no use for
    * them). Returns (cards incl. the END card, sawEnd). */
  def parseBlock(bytes: Array[Byte], off: Int): (Seq[FitsCard], Boolean) = {
    val out = Seq.newBuilder[FitsCard]
    var ended = false
    var i = off
    val stop = off + BlockSize
    while (i < stop && !ended) {
      val line = new String(bytes, i, CardSize, StandardCharsets.US_ASCII)
      parseCard(line).foreach { c =>
        out += c
        if (c.key == "END") ended = true
      }
      i += CardSize
    }
    (out.result(), ended)
  }

  /** Read one header (walk whole 2880 blocks until the END card, exactly
    * like `readfitsheader`). Returns (cards without END, offset of the
    * byte after the last header block), or None on truncation. */
  def readHeader(bytes: Array[Byte], off: Int): Option[(Seq[FitsCard], Int)] = {
    var i = off
    val cards = Seq.newBuilder[FitsCard]
    var ended = false
    while (!ended) {
      if (i + BlockSize > bytes.length) return None
      val (cs, sawEnd) = parseBlock(bytes, i)
      cards ++= cs.filterNot(_.key == "END")
      ended = sawEnd
      i += BlockSize
    }
    Some((cards.result(), i))
  }

  /** Merge CONTINUE long-string cards (public FITS convention: a quoted
    * value ending in `&` continues on the next CONTINUE card). Cards
    * without continuations pass through untouched. */
  def mergeContinuations(cards: Seq[FitsCard]): Seq[FitsCard] = {
    val out = Seq.newBuilder[FitsCard]
    var i = 0
    while (i < cards.length) {
      var c = cards(i)
      while (c.strValue.exists(_.endsWith("&")) && i + 1 < cards.length &&
             cards(i + 1).key == "CONTINUE") {
        val nxt = cards(i + 1)
        val merged = c.strValue.get.dropRight(1) + nxt.strValue.getOrElse(nxt.raw.trim)
        c = FitsCard(c.key, s"'${merged.replace("'", "''")}'",
          c.comment.orElse(nxt.comment))
        i += 1
      }
      out += c
      i += 1
    }
    out.result()
  }

  /** First card for a key (the reference's `fitsheader.get`). */
  def get(cards: Seq[FitsCard], key: String): Option[FitsCard] =
    cards.find(_.key == key)

  /** Extension data size incl. 2880 padding (`getextsize`,
    * dlyfix_fits.py:62): product of NAXIS1..NAXISn, rounded up. */
  def extDataSize(cards: Seq[FitsCard]): Long =
    if (get(cards, "XTENSION").isEmpty) 0L
    else {
      val naxis = get(cards, "NAXIS").flatMap(_.longValue).getOrElse(0L).toInt
      // NAXIS = 0 ⇒ NO data array (an empty product would be 1 and
      // round up to a phantom 2880-byte block, mis-walking any HDU
      // that follows a data-less extension)
      val sz =
        if (naxis == 0) 0L
        else (1 to naxis)
          .map(i => get(cards, s"NAXIS$i").flatMap(_.longValue).getOrElse(0L))
          .product
      if (sz % BlockSize > 0) sz + (BlockSize - sz % BlockSize) else sz
    }

  /** All HDUs of a file: (hduIndex, header cards) — primary header, then
    * each extension header, skipping data blocks via [[extDataSize]]. */
  def readHdus(bytes: Array[Byte]): Seq[(Int, Seq[FitsCard])] = {
    val out = Seq.newBuilder[(Int, Seq[FitsCard])]
    var off = 0
    var hdu = 0
    var more = off + BlockSize <= bytes.length
    while (more) {
      readHeader(bytes, off) match {
        case Some((cards, next)) =>
          out += ((hdu, mergeContinuations(cards)))
          off = next + extDataSize(cards).toInt // in-memory file ⇒ < 2 GiB
          hdu += 1
          more = off + BlockSize <= bytes.length
        case None => more = false
      }
    }
    out.result()
  }

  // ------------------------------------------------------------------
  // Binary table (XTENSION = BINTABLE)
  // ------------------------------------------------------------------

  /** One TTYPE/TFORM column: FITS letter code + repeat count + its
    * byte width per element (dlyfix_fits.py:151-178). */
  final case class BinColumn(name: String, code: Char, repeat: Int) {
    val byteSize: Int = code match {
      case 'A' | 'B' => repeat
      case 'I'       => 2 * repeat
      case 'J' | 'E' => 4 * repeat
      case 'K' | 'D' => 8 * repeat
      case 'X'       => math.max(1, repeat / 8) // ref reads n/8 bytes
      case c         => throw new IllegalArgumentException(s"FITS TFORM '$c$repeat' not understood")
    }
  }

  final case class BinTableSchema(cols: Seq[BinColumn], rowSize: Int, nrow: Int)

  /** Build the table schema from an extension header's cards
    * (`binarytable.__init__`, dlyfix_fits.py:134-189): walk TTYPE1/
    * TFORM1, TTYPE2/TFORM2, ... until the first gap. */
  def binTableSchema(cards: Seq[FitsCard]): Option[BinTableSchema] =
    for {
      rowSize <- get(cards, "NAXIS1").flatMap(_.longValue)
      nrow <- get(cards, "NAXIS2").flatMap(_.longValue)
    } yield {
      val cols = Iterator.from(1)
        .map { i =>
          for {
            tt <- get(cards, s"TTYPE$i")
            tf <- get(cards, s"TFORM$i")
          } yield {
            val name = tt.strValue.getOrElse(tt.raw.trim)
            val fmt = tf.strValue.getOrElse(tf.raw.trim)
            val code = fmt.last
            val n = fmt.dropRight(1)
            BinColumn(name, code, if (n.isEmpty) 1 else n.toInt)
          }
        }
        .takeWhile(_.isDefined)
        .flatten
        .toSeq
      BinTableSchema(cols, rowSize.toInt, nrow.toInt)
    }

  /** Decode one big-endian row (`parserow`, dlyfix_fits.py:195): strings
    * decode to String, repeat-1 numerics to a scalar, repeat-n numerics
    * to a Seq. */
  def parseRow(schema: BinTableSchema, bytes: Array[Byte], off: Int): Map[String, Any] = {
    require(off + schema.rowSize <= bytes.length, "truncated binary-table row")
    val bb = ByteBuffer.wrap(bytes, off, schema.rowSize)
    def one(code: Char): Any = code match {
      case 'B' | 'X' => bb.get() & 0xff
      case 'I'       => bb.getShort()
      case 'J'       => bb.getInt()
      case 'K'       => bb.getLong()
      case 'E'       => bb.getFloat()
      case 'D'       => bb.getDouble()
      case c         => throw new IllegalArgumentException(s"unreachable TFORM '$c'")
    }
    schema.cols.map { c =>
      val v: Any = c.code match {
        case 'A' =>
          val a = new Array[Byte](c.repeat); bb.get(a)
          new String(a, StandardCharsets.US_ASCII)
        case 'X' =>
          Seq.fill(c.byteSize)(bb.get() & 0xff)
        case code if c.repeat == 1 => one(code)
        case code                  => Seq.fill(c.repeat)(one(code))
      }
      c.name -> v
    }.toMap
  }

  /** All rows of the binary table whose header starts the extension at
    * `dataOff` (`history_class.read`, dlyfix_fits.py:241). */
  def parseTable(schema: BinTableSchema, bytes: Array[Byte], dataOff: Int): Seq[Map[String, Any]] =
    (0 until schema.nrow).map(r => parseRow(schema, bytes, dataOff + r * schema.rowSize))

  /** Convenience: locate the extension whose EXTNAME matches and return
    * its decoded rows (how the reference reads the PSRFITS HISTORY
    * table). */
  def namedTable(bytes: Array[Byte], extName: String): Seq[Map[String, Any]] = {
    var off = 0
    var found: Option[(Seq[FitsCard], Int)] = None
    var more = off + BlockSize <= bytes.length
    while (more && found.isEmpty) {
      readHeader(bytes, off) match {
        case Some((cards, next)) =>
          if (get(cards, "EXTNAME").flatMap(_.strValue).contains(extName))
            found = Some((cards, next))
          else { off = next + extDataSize(cards).toInt; more = off + BlockSize <= bytes.length }
        case None => more = false
      }
    }
    found.toSeq.flatMap { case (cards, dataOff) =>
      binTableSchema(cards).toSeq.flatMap(parseTable(_, bytes, dataOff))
    }
  }

  // ------------------------------------------------------------------
  // Write-back (fitsline.output dlyfix_fits.py:10, fitsheader.output
  // :52, binarytable.writerow :216, history_class.output/appendrow
  // :255-266): the reference's dlyfix doesn't just read archives — it
  // rewrites them (parse → correct → write). These are the write halves
  // of the parse functions above, byte-faithful where the reference is
  // merely self-consistent: an untouched parse→write round trip
  // reproduces the input bytes exactly, because value cards write their
  // parsed `raw` field verbatim instead of re-justifying it.
  // ------------------------------------------------------------------

  /** Render one card to its fixed 80-char line. COMMENT/HISTORY/CONTINUE
    * write `key + raw`; value cards write `KEY.ljust(8) = raw [/ comment]`
    * with the raw value field verbatim — see [[fmtValue]] for building a
    * NEW raw field in the standard fixed-format justification. */
  def formatCard(c: FitsCard): String = {
    val line = c.key match {
      case "END"                               => "END"
      case "COMMENT" | "HISTORY" | "CONTINUE"  => c.key + c.raw
      case k =>
        k.padTo(8, ' ') + "=" + c.raw + c.comment.fold("")(cm => s"/ $cm")
    }
    require(line.length <= CardSize, s"FITS card overflows 80 chars: '$line'")
    line.padTo(CardSize, ' ')
  }

  /** Fixed-format raw value field for a new/updated card: right-justified
    * so the value ends at byte 30 of the card (the convention the
    * reference's `% 22s` format and every PSRFITS writer follow; strings
    * carry their quotes inside the field). */
  def fmtValue(v: Any): String = {
    val s = v match {
      case b: Boolean => if (b) "T" else "F"
      case str: String => "'" + str.replace("'", "''") + "'"
      case other => other.toString
    }
    if (s.length >= 21) s else (" " * (21 - s.length)) + s
  }

  /** Replace the value (and optionally comment) of the first card with
    * `key`, keeping card order — the reference mutates `fitsline.val` in
    * place (dlyfix_fits.py:258). Appends a new card if the key is absent. */
  def setValue(cards: Seq[FitsCard], key: String, value: Any,
               comment: Option[String] = None): Seq[FitsCard] =
    if (cards.exists(_.key == key))
      cards.map(c => if (c.key == key)
        FitsCard(key, fmtValue(value), comment.orElse(c.comment)) else c)
    else cards :+ FitsCard(key, fmtValue(value), comment)

  /** Header bytes: every card, an END card, space-padded to whole
    * 2880-byte blocks (`fitsheader.output`, dlyfix_fits.py:52-60). */
  def headerBytes(cards: Seq[FitsCard]): Array[Byte] = {
    val body = cards.filterNot(_.key == "END").map(formatCard).mkString +
      "END".padTo(CardSize, ' ')
    padBlock(body.getBytes(StandardCharsets.US_ASCII), ' '.toByte)
  }

  private def padBlock(b: Array[Byte], pad: Byte): Array[Byte] =
    if (b.length % BlockSize == 0) b
    else b ++ Array.fill(BlockSize - b.length % BlockSize)(pad)

  /** Encode one big-endian binary-table row — the inverse of [[parseRow]]
    * (`binarytable.writerow`, dlyfix_fits.py:216): accepts exactly the
    * value shapes parseRow produces (String for A, scalar for repeat-1
    * numerics, Seq for repeat-n and X bit-bytes), plus any widening
    * integer/float scalar. */
  def packRow(schema: BinTableSchema, row: Map[String, Any]): Array[Byte] = {
    val bb = ByteBuffer.allocate(schema.rowSize)
    def asLong(v: Any): Long = v match {
      case b: Byte => b.toLong
      case s: Short => s.toLong
      case i: Int => i.toLong
      case l: Long => l
      case other => throw new IllegalArgumentException(s"not an integer: $other")
    }
    def asDouble(v: Any): Double = v match {
      case f: Float => f.toDouble
      case d: Double => d
      case other => asLong(other).toDouble
    }
    schema.cols.foreach { c =>
      val v = row.getOrElse(c.name,
        throw new IllegalArgumentException(s"row missing column '${c.name}'"))
      c.code match {
        case 'A' =>
          val s = v.toString
          require(s.length <= c.repeat, s"'${c.name}' value '$s' exceeds ${c.repeat}A")
          bb.put(s.padTo(c.repeat, ' ').getBytes(StandardCharsets.US_ASCII))
        case code =>
          val n = if (code == 'X') c.byteSize else c.repeat
          val vals: Seq[Any] = v match {
            case s: Seq[_] => s.asInstanceOf[Seq[Any]]
            case one => Seq(one)
          }
          require(vals.length == n, s"'${c.name}' expects $n elements, got ${vals.length}")
          vals.foreach { x =>
            code match {
              case 'B' | 'X' => bb.put((asLong(x) & 0xff).toByte)
              case 'I'       => bb.putShort(asLong(x).toShort)
              case 'J'       => bb.putInt(asLong(x).toInt)
              case 'K'       => bb.putLong(asLong(x))
              case 'E'       => bb.putFloat(asDouble(x).toFloat)
              case 'D'       => bb.putDouble(asDouble(x))
              case other     => throw new IllegalArgumentException(s"unreachable TFORM '$other'")
            }
            ()
          }
      }
    }
    bb.array()
  }

  /** Table data bytes, space-padded to whole blocks like the reference's
    * `output().ljust(...)` (`history_class.output`, dlyfix_fits.py:261). */
  def tableBytes(schema: BinTableSchema, rows: Seq[Map[String, Any]]): Array[Byte] =
    padBlock(rows.toArray.flatMap(packRow(schema, _)), ' '.toByte)

  /** One HDU with its raw (already block-padded) data extent. */
  final case class Hdu(cards: Seq[FitsCard], data: Array[Byte]) {

    /** Append one binary-table row and bump NAXIS2, like
      * `history_class.appendrow` (dlyfix_fits.py:255): re-encodes the
      * data extent from the parsed rows plus the new one. */
    def appendTableRow(row: Map[String, Any]): Hdu = {
      val schema = binTableSchema(cards).getOrElse(
        throw new IllegalArgumentException("appendTableRow: HDU has no binary table"))
      val rows = parseTable(schema, data, 0) :+ row
      Hdu(setValue(cards, "NAXIS2", rows.length.toLong),
        tableBytes(schema.copy(nrow = rows.length), rows))
    }
  }

  /** All HDUs with their data extents — the full-file counterpart of
    * [[readHdus]], so [[fileBytes]] can reassemble the archive. */
  def readHdusWithData(bytes: Array[Byte]): Seq[Hdu] = {
    val out = Seq.newBuilder[Hdu]
    var off = 0
    var more = off + BlockSize <= bytes.length
    while (more) {
      readHeader(bytes, off) match {
        case Some((cards, next)) =>
          val dataEnd = next + extDataSize(cards).toInt
          out += Hdu(cards, java.util.Arrays.copyOfRange(bytes, next, dataEnd))
          off = dataEnd
          more = off + BlockSize <= bytes.length
        case None => more = false
      }
    }
    out.result()
  }

  /** Reassemble a whole archive: headers re-rendered, data extents
    * verbatim. `fileBytes(readHdusWithData(b)) == b` for any file this
    * parser reads — the dlyfix round-trip contract. */
  def fileBytes(hdus: Seq[Hdu]): Array[Byte] =
    hdus.toArray.flatMap(h => headerBytes(h.cards) ++ h.data)

  /** Distributed archive rewrite — the dlyfix shape (parse → correct →
    * write) over a directory of FITS files: one task per file via
    * `binaryFile`, each file's corrected bytes written executor-side to
    * `outDir/<name>` through the Hadoop `FileSystem` API, so `outDir`
    * accepts any Spark-supported URI (`hdfs://`, `s3a://`, `file:` or a
    * plain local path) with the session's Hadoop configuration —
    * credentials included — rebuilt per task. Correction logic runs
    * fully parallel, no shuffle. Returns the written file names (the
    * only thing that reaches the driver — a manifest, bounded by file
    * count, never file contents). */
  def transformFiles(spark: SparkSession, inPath: String, outDir: String)(
      f: Seq[Hdu] => Seq[Hdu]): Seq[String] = {
    import spark.implicits._
    import org.apache.hadoop.conf.Configuration
    import org.apache.hadoop.fs.{FileSystem, Path => HPath}
    // Configuration isn't Serializable: ship its flattened entries
    // (defaults + session overrides, so s3a/hdfs credentials survive)
    // and rebuild one Configuration per task
    val hconf = spark.sessionState.newHadoopConf()
    val confEntries: Array[(String, String)] = {
      val b = Array.newBuilder[(String, String)]
      val it = hconf.iterator()
      while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue }
      b.result()
    }
    spark.read.format("binaryFile").load(inPath)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .mapPartitions { rows =>
        val conf = new Configuration(false)
        confEntries.foreach { case (k, v) => conf.set(k, v) }
        val base = new HPath(outDir)
        val fs: FileSystem = base.getFileSystem(conf)
        fs.mkdirs(base)
        rows.map { case (path, bytes) =>
          val name = path.substring(path.lastIndexOf('/') + 1)
          val os = fs.create(new HPath(base, name), true)
          try os.write(fileBytes(f(readHdusWithData(bytes))))
          finally os.close()
          name
        }
      }
      .collect().toSeq.sorted
  }

  /** One exploded card row for the distributed loader. */
  final case class CardRow(
      source_file: String,
      hdu: Int,
      pos: Int,
      key: String,
      raw: String,
      str_value: Option[String],
      long_value: Option[Long],
      double_value: Option[Double],
      bool_value: Option[Boolean],
      comment: Option[String])

  /** Distributed card catalog over a directory of FITS files: one row
    * per card per HDU per file. `binaryFile` gives one task per file —
    * a 10⁶-file archive parses with full cluster parallelism; the
    * explode is a pure map stage (no shuffle). */
  def load(spark: SparkSession, path: String): DataFrame = {
    import spark.implicits._
    spark.read.format("binaryFile").load(path)
      .select("path", "content")
      .as[(String, Array[Byte])]
      .flatMap { case (file, bytes) =>
        readHdus(bytes).flatMap { case (hdu, cards) =>
          cards.zipWithIndex.map { case (c, pos) =>
            CardRow(file, hdu, pos, c.key, c.raw.trim, c.strValue,
              c.longValue, c.doubleValue, c.boolValue, c.comment)
          }
        }
      }
      .toDF()
  }

  /** Column-level card value-typing: each (id, text) row splits into
    * newline-separated 80-char card images, parses each through
    * [[parseCard]] — the same per-card path [[parseBlock]] walks — then
    * merges CONTINUE long strings via [[mergeContinuations]] and emits
    * one row per surviving card with the [[CardRow]] coercions
    * (str/bool/long/double, each independent) plus the winning value
    * class by the engine's coercion priority: quoted string > logical
    * T/F > integer > double (Fortran D exponents) > undefined. q149
    * fabricates card images from table columns and its DuckDB oracle
    * replays this typing generically — the string-level grammar
    * (quote-aware `/` comment split, `''` escapes, trailing-blank trim,
    * `&`+CONTINUE merge) stays cross-checked against a second engine.
    * Reference: dlyfix_fits.py:89 `parsefitshdr` + the fitsline value
    * accessors. */
  def parseCardColumn(df: DataFrame, idCol: String, textCol: String): DataFrame =
    ParseColumn.rows(df, idCol, textCol) { (id, text) =>
      val cards = text.split('\n').toSeq.flatMap(parseCard).filterNot(_.key == "END")
      mergeContinuations(cards).map { c =>
        val vt =
          if (c.strValue.isDefined) "str"
          else if (c.boolValue.isDefined) "bool"
          else if (c.longValue.isDefined) "int"
          else if (c.doubleValue.isDefined) "float"
          else "undef"
        (id, c.key, c.raw.trim, vt, c.strValue, c.boolValue, c.longValue,
          c.doubleValue, c.comment)
      }
    }.toDF("card_id", "key", "raw", "value_type", "str_value", "bool_value",
      "long_value", "double_value", "comment")
}
