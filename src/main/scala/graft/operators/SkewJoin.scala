package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted equi-join for deterministic hot keys (SCALE.md "Joins").
  *
  * AQE's skew-join split handles discovered skew at runtime; salting is
  * the static answer when hot keys are known up front (a viral user_id, a
  * null-bucket surrogate): the probe side spreads each key across `salt`
  * sub-keys, the build side is replicated `salt` ways, so one hot key
  * occupies `salt` tasks instead of one straggler.
  *
  * Build-side replication costs |right| × salt — use for dimension-sized
  * build sides that are too big to broadcast but small enough to
  * replicate, the gap where salting beats both broadcast and plain
  * shuffle on a skewed fact table.
  */
object SkewJoin {

  def saltedInnerJoin(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      salt: Int): DataFrame = {
    require(salt > 1, "salt must spread keys across >1 sub-key")
    // Probe rows get a salt derived from a row-local counter — spreads
    // uniformly regardless of key skew.
    val saltedLeft = left.withColumn("__salt",
      pmod(monotonically_increasing_id(), lit(salt.toLong)).cast("int"))
    // Build rows are replicated once per salt value.
    val saltedRight = right.withColumn("__salt",
      explode(sequence(lit(0), lit(salt - 1))))
    saltedLeft
      .join(saltedRight,
        saltedLeft(leftKey) === saltedRight(rightKey) &&
          saltedLeft("__salt") === saltedRight("__salt"))
      .drop("__salt")
  }
}
