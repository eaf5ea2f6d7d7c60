package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Salted join for skewed keys.
  *
  * When one join key holds a disproportionate share of the fact rows
  * (hot user, hot SKU), a plain hash join lands the whole key on one
  * task. Salting splits each hot key into `salt` sub-keys on the big
  * side and replicates the small side `salt`×, so the hot key fans
  * out over `salt` tasks. AQE's skew-join mitigation handles the
  * moderate cases at runtime; explicit salting is for the pathological
  * ones a planner can't split (single-key hotspots in a shuffle-hash
  * join, pre-AQE engines, or deterministic layout control).
  *
  * Result equality with the plain join is asserted in SkewJoinSpec.
  */
object SkewJoin {

  /** Inner equi-join `big ⋈ small` on `bigKey === smallKey`,
    * salt-fanned to `salt` sub-keys. `small` is replicated salt× via
    * explode (and broadcast if it qualifies — replication only costs
    * salt × |small|).
    */
  def saltedJoin(big: DataFrame, small: DataFrame,
      bigKey: Column, smallKey: Column, salt: Int): DataFrame = {
    // deterministic spread: hash the row's key + a fast row fingerprint
    val saltedBig = big.withColumn("_salt",
      pmod(xxhash64(bigKey, monotonically_increasing_id()), lit(salt)))
    val saltedSmall = small
      .withColumn("_salt", explode(sequence(lit(0L), lit(salt - 1L))))
    saltedBig.join(saltedSmall,
        bigKey === smallKey && saltedBig("_salt") === saltedSmall("_salt"))
      .drop("_salt")
  }
}
