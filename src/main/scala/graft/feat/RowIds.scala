package graft.feat

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions.udf

import graft.util.Hashing

/** Stable row ids derived from `image_id` (SURVEY.md §1.1): the reference
  * assigns dense indices after a global shuffle
  * (`/root/reference/lsh_based_clustering.py:184-189`); a global sort/shuffle
  * is a scale anti-pattern, so we derive ids by hashing — deterministic,
  * partition-order independent, no global ordering stage.
  *
  * Collision note: 64-bit ids are collision-safe to ~10^9 rows (p < 1e-2 at
  * 6e8 rows); at true 10^12 scale switch `rowIdCol` to a 128-bit id
  * (two-column) — all downstream operators key on the id opaquely.
  */
object RowIds {
  val rowIdUdf = udf((s: String) => Hashing.stringHash(s))

  def rowIdCol(imageId: Column): Column = rowIdUdf(imageId)

  def rowId(imageId: String): Long = Hashing.stringHash(imageId)
}
