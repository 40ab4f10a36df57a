package graft.sources

import scala.reflect.runtime.universe.TypeTag

import org.apache.spark.sql.{DataFrame, Dataset, Encoder, Encoders}
import org.apache.spark.sql.functions.col

/** The shared column-level parser shape behind `ParFile.parseColumn`,
  * `ResidualFile.parseColumn`, `ProjectConfig.parseColumn`,
  * `HeaderFile.parseColumn` and `DynspecFile.parseColumn` (the
  * q143/q145/q146/q147/q148 fabricated-text oracle entry points): one place owns
  * the (id, text) contract — null rows drop, the id casts to long, the
  * text to string, and the per-row parser fans out via a typed flatMap. */
private[sources] object ParseColumn {
  def rows[T <: Product: TypeTag](df: DataFrame, idCol: String, textCol: String)(
      f: (Long, String) => IterableOnce[T]): Dataset[T] = {
    implicit val enc: Encoder[T] = Encoders.product[T]
    // cast FIRST, null-filter the casted values: an id that exists but
    // doesn't cast to long (a string key, an overflowing decimal) must
    // DROP like a null row per the contract — filtering the raw column
    // would pass it through and crash the non-nullable Long encoder
    df.select(col(idCol).cast("long").as("__id"), col(textCol).cast("string").as("__t"))
      .filter(col("__id").isNotNull && col("__t").isNotNull)
      .as[(Long, String)](Encoders.tuple(Encoders.scalaLong, Encoders.STRING))
      .flatMap { case (id, t) => f(id, t) }
  }
}
