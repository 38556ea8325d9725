package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-handling join utilities (SURVEY §4, 100 TB posture).
  *
  * AQE's skew-join splitting (`spark.sql.adaptive.skewJoin.enabled`, on
  * by default) handles most skew at runtime; explicit salting remains the
  * tool when one key dominates so badly that even split partitions bottom
  * out on a single task's build side, or when AQE is unavailable
  * (streaming joins, hinted plans).
  */
object Skew {

  /** Salted equi-join: the skewed probe side scatters uniformly across
    * `salt` sub-keys; the build side replicates `salt` times. The join
    * then shuffles on (key, salt) — a dominant key spreads over `salt`
    * tasks instead of one.
    *
    * Equivalent to `skewed.join(build, key, joinType)` for inner/left
    * joins (the replicated build side matches exactly one salt per probe
    * row). Build-side replication costs |build| × salt — size salt to
    * the skew factor, not higher.
    */
  def saltedJoin(
      skewed: DataFrame,
      build: DataFrame,
      key: String,
      salt: Int,
      joinType: String = "inner"): DataFrame = {
    require(salt > 0, "salt must be positive")
    // Salt = hash of the probe's hashable columns: deterministic under
    // stage retries. A nondeterministic salt (monotonic id / rand) in a
    // shuffle key silently duplicates or drops rows when a lost
    // executor recomputes different values (SPARK-23207 class).
    // Full-row duplicates collapse onto one salt, which only matters
    // if a single key's rows are ALL identical — then salting cannot
    // help anyway (the rows are indistinguishable). MapType columns are
    // excluded (Spark forbids hashing maps); if nothing else is
    // hashable the probe rows are indistinguishable anyway and the
    // join-key hash alone keeps the expression well-formed.
    import org.apache.spark.sql.types.{ArrayType, DataType, MapType, StructType}
    def hasMap(dt: DataType): Boolean = dt match {
      case _: MapType => true
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case a: ArrayType => hasMap(a.elementType)
      case _ => false
    }
    val hashable = skewed.schema.fields.toIndexedSeq.collect {
      case f if !hasMap(f.dataType) => col(f.name)
    }
    val saltSrc = if (hashable.nonEmpty) hashable else IndexedSeq(col(key))
    val scattered = skewed.withColumn("__graft_salt",
      pmod(xxhash64(saltSrc: _*), lit(salt.toLong)).cast("int"))
    val replicated = build.withColumn("__graft_salt",
      explode(sequence(lit(0), lit(salt - 1))))
    scattered
      .join(replicated, Seq(key, "__graft_salt"), joinType)
      .drop("__graft_salt")
  }

  /** Top-N heavy-hitter keys with counts — the diagnosis step before
    * choosing a salt factor. */
  def keySkewProfile(df: DataFrame, key: String, topN: Int = 20): DataFrame =
    df.groupBy(col(key)).agg(count(lit(1)).as("n_rows"))
      .orderBy(col("n_rows").desc)
      .limit(topN)
}
