package graft.core

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-mitigation join helpers.
  *
  * A hash join shuffles both sides on the key; one hot key (the
  * monitoring station everyone references, the "en" language bucket)
  * lands its entire volume on ONE reduce task and the stage runs at
  * the speed of that straggler. AQE's skew-join split handles this for
  * sort-merge joins at runtime; the explicit salt below is the plan
  * for the cases AQE can't touch (broadcast-ineligible dims joined by
  * key, aggregations, deterministic plans with AQE off) and documents
  * the technique as a first-class library capability.
  */
object Joins {

  /** Equi-join `fact ⋈ dim` on `key`, with the fact side's hot keys
    * spread over `salt` sub-keys. The fact side gets a DETERMINISTIC
    * salt from its row content hash (no rand(): retries and speculative
    * tasks must re-produce identical output); the dim side replicates
    * each row `salt` times (explode over the salt range — dim is the
    * small-but-not-broadcastable side, so ×salt is affordable). The
    * join key becomes (key, salt_bucket): a key carrying k% of the
    * table now spreads over `salt` reduce tasks instead of one.
    *
    * Exact same result set as the unsalted join (inner, key-equal) —
    * proven by spec — because every fact row meets every dim row of
    * its key exactly once: the fact row's single salt value matches
    * the dim row's replica with that value. */
  def saltedJoin(fact: DataFrame, dim: DataFrame, key: String,
      salt: Int = 8): DataFrame = {
    require(salt > 0, s"salt must be positive: $salt")
    val factS = fact.withColumn("_salt",
      pmod(hash(fact.columns.map(col).toSeq: _*), lit(salt)))
    val dimS = dim.withColumn("_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    factS.join(dimS, Seq(key, "_salt")).drop("_salt")
  }
}
