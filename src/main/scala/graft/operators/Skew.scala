package graft.operators

import org.apache.spark.sql.{Column, DataFrame, SaveMode, SparkSession}
import org.apache.spark.sql.functions._

/** Skew and shuffle-placement controls for 100 TB operation.
  *
  * - [[saltedAggregate]]: two-phase aggregation for hot grouping keys — a
  *   random salt splits each key across `numSalts` reducers for the heavy
  *   partial phase, then a cheap final phase over `keys × numSalts` rows
  *   recombines. Results are identical to a direct groupBy (counts/sums are
  *   associative); only the shuffle placement changes.
  * - [[Bucketing]]: persist both sides of a recurring join bucketed on the
  *   join key so the join is co-located — zero Exchange at query time, the
  *   standard warehouse layout for repeated large-scale joins.
  */
object Skew {

  /** Deterministic salt in [0, numSalts): a full-row xxhash64 instead of
    * rand(seed). Rand is a nondeterministic expression even when seeded
    * (its stream restarts per partition), which marks the stage
    * INDETERMINATE — any shuffle-fetch failure then rolls back and reruns
    * the WHOLE stage, and the state-store placement [[saltedJoin]]
    * advertises for stateful streaming would silently depend on the source
    * re-presenting identical partitions on replay. A row hash keeps the
    * same uniform spread (the non-key columns vary within a hot key) with
    * none of that: same row → same salt on any retry, any partitioning.
    * Caveat: bitwise-identical duplicate rows share a salt — irrelevant for
    * aggregation (map-side partial combine collapses them anyway) and
    * acceptable for the join (identical rows produce identical output).
    * xxhash64 rejects MapType anywhere in its input (maps have no
    * canonical entry order), so a TOP-LEVEL map column is hashed through
    * `array_sort(map_entries(...))` — a canonical (key-sorted) rendering,
    * so two logically-equal maps built in different entry orders (e.g. a
    * shuffled upstream re-presenting partitions differently on task
    * retry) always salt identically. A map NESTED deeper (inside an
    * array/struct, or a map-valued map) has no expression-reachable
    * canonical form and is EXCLUDED from the salt input — a weaker spread
    * (other columns still vary within a hot key) but never an unstable
    * one; a cast-to-string rendering would re-open the indeterminate-
    * retry problem this salt exists to close. */
  private[graft] def rowSalt(df: DataFrame, numSalts: Int): Column = {
    import org.apache.spark.sql.types.{ArrayType, MapType, StructType}
    def hasMap(dt: org.apache.spark.sql.types.DataType): Boolean = dt match {
      case _: MapType => true
      case a: ArrayType => hasMap(a.elementType)
      case s: StructType => s.fields.exists(f => hasMap(f.dataType))
      case _ => false
    }
    val inputs = df.schema.fields.flatMap { f =>
      f.dataType match {
        case m: MapType if !hasMap(m.keyType) && !hasMap(m.valueType) =>
          Some(array_sort(map_entries(col(f.name))))
        case dt if hasMap(dt) => None
        case _ => Some(col(f.name))
      }
    }
    // a schema whose every column nests a map degenerates to salt 0 —
    // still deterministic, and strictly better than failing analysis
    val safe = if (inputs.isEmpty) Seq(lit(0L)) else inputs.toIndexedSeq
    pmod(xxhash64(safe: _*), lit(numSalts.toLong)).cast("int")
  }

  /** Two-phase count/sum aggregation with key salting. `sums` maps output
    * column name → column to sum. */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      sums: Map[String, Column],
      numSalts: Int = 16): DataFrame = {
    val salted = df.withColumn("__salt", rowSalt(df, numSalts))
    val partialAggs = sums.toSeq.map { case (name, c) =>
      sum(c).as(s"__p_$name")
    } :+ count(lit(1)).as("__p_cnt")
    val partial = salted
      .groupBy((keys.map(col) :+ col("__salt")): _*)
      .agg(partialAggs.head, partialAggs.tail: _*)
    val finalAggs = sums.keys.toSeq.map { name =>
      sum(col(s"__p_$name")).as(name)
    } :+ sum(col("__p_cnt")).as("n_rows")
    partial.groupBy(keys.map(col): _*).agg(finalAggs.head, finalAggs.tail: _*)
  }

  /** Hot-key equi-join with STATIC salting: the (large, skewed) fact side
    * draws a uniform salt, the (small) dim side is replicated `numSalts`
    * times at scan stage, and the join runs on (key, salt) — each hot key
    * spreads over `numSalts` reducers instead of melting one. The result
    * is identical to the plain join (the salt is a join-placement detail).
    *
    * When to use over AQE's runtime skew split ([[zipfianJoinDemo]]):
    * stateful streaming joins (AQE is disabled in stateful workloads, so
    * a skewed stream-stream or stream-static shuffle join has no runtime
    * rescue) and joins whose skew is known and permanent — the salt also
    * rebalances the downstream state stores, which AQE never touches.
    * Cost: the dim side is `numSalts`× larger on the wire; keep it to the
    * genuinely-small side.
    */
  def saltedJoin(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      numSalts: Int = 16): DataFrame = {
    require(numSalts >= 1, "numSalts must be >= 1")
    require(!(fact.columns ++ dim.columns).contains("__salt"),
      "input frames must not contain reserved column __salt")
    val saltedFact = fact.withColumn("__salt", rowSalt(fact, numSalts))
    val repDim = dim.withColumn("__salt",
      explode(sequence(lit(0), lit(numSalts - 1))))
    saltedFact.join(repDim, Seq(key, "__salt")).drop("__salt")
  }

  /** `numSalts` DERIVED from [[keySkewProfile]] instead of hand-picked —
    * the measure→act pattern (autoPlanes/autoCentroids/containment
    * dispatch) applied to shuffle placement: the profile's
    * `recommended_salts` = ⌈hot·n_keys/n_rows⌉ is exactly the ⌈hot/avg⌉
    * factor by which the hottest key melts one reducer, so salting by it
    * restores ~average-sized partitions. Clamped to [1, maxSalts]
    * (replicating the dim side / widening the final phase beyond ~1024×
    * costs more than the straggler it prevents). Multiple keys profile
    * as their struct — skew is a property of the COMPOSITE grouping key.
    * Cost: one map-side-combinable (key, count) aggregate + a 1-row fold
    * — the profile a capacity plan runs anyway (q186). */
  def autoSalts(df: DataFrame, keys: Seq[String],
      maxSalts: Int = 1024): Int = {
    require(keys.nonEmpty, "autoSalts needs at least one key")
    val keyed =
      if (keys.sizeIs == 1) df.select(col(keys.head).as("__k"))
      else df.select(struct(keys.map(col): _*).as("__k"))
    val r = keySkewProfile(keyed, "__k")
      .select(col("recommended_salts")).head()
    if (r.isNullAt(0)) 1
    else math.min(maxSalts.toLong, math.max(1L, r.getLong(0))).toInt
  }

  /** [[saltedAggregate]] with the salt count auto-derived by
    * [[autoSalts]]. Output identical to the fixed-salt (and plain
    * groupBy) form — the derivation only moves shuffle placement. */
  def saltedAggregateAuto(
      df: DataFrame,
      keys: Seq[String],
      sums: Map[String, Column],
      maxSalts: Int = 1024): DataFrame =
    saltedAggregate(df, keys, sums, autoSalts(df, keys, maxSalts))

  /** [[saltedJoin]] with the salt count auto-derived from the FACT side's
    * key profile by [[autoSalts]]. */
  def saltedJoinAuto(
      fact: DataFrame,
      dim: DataFrame,
      key: String,
      maxSalts: Int = 1024): DataFrame =
    saltedJoin(fact, dim, key, autoSalts(fact, Seq(key), maxSalts))

  /** Synthetic zipfian equi-join — the AQE skew-split demonstrator: half
    * the fact rows share ONE join key (`key = 0`), the rest hash-spread
    * over `nKeys`, joined to a `nKeys`-row dim and aggregated. Under a
    * disabled broadcast threshold this is a sort-merge join whose hot
    * shuffle partition AQE must split (`skew=true` on the join,
    * `AQEShuffleRead ... skewed` on its inputs) — the runtime counterpart
    * to [[saltedAggregate]]'s static salting: at 100 TB you salt the
    * aggregations you KNOW are hot and let AQE re-plan the joins whose
    * skew only shows up in the data. SkewSpec asserts the split engages;
    * PlanDump captures the executed final plan as evidence in PLANS.md.
    */
  def zipfianJoinDemo(spark: SparkSession, nRows: Long, nKeys: Int): DataFrame = {
    val fact = spark.range(nRows).select(
      when(col("id") % 2 === 0, lit(0L))
        .otherwise(pmod(hash(col("id")).cast("long"), lit(nKeys.toLong)))
        .as("key"),
      col("id").as("v"))
    val dim = spark.range(nKeys.toLong).select(col("id").as("key"),
      concat(lit("k"), col("id")).as("label"))
    fact.join(dim, "key")
      .groupBy(col("label"))
      .agg(count(lit(1)).as("n"), sum(col("v")).as("sum_v"))
  }

  /** The conf set that makes the skew split observable at test scale:
    * broadcast off (forces the shuffle join), thresholds lowered so a
    * local[4] hot partition qualifies as skewed (production defaults are
    * 256 MB / factor 5 — correct at cluster scale, unreachable in a test
    * JVM). */
  val skewDemoConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.adaptive.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.enabled" -> "true",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "2",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "64KB",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "64KB")

  /** Confs that let Catalyst's RUNTIME bloom-filter injection fire at
    * local test scale. The mechanism (InjectRuntimeFilter): a selective
    * predicate on one side of a shuffle equi-join plants a
    * `bloom_filter_might_contain` probe — built from the filtered side's
    * join keys — onto the OTHER side's scan, discarding non-joining fact
    * rows BEFORE they are shuffled. At 100 TB that is the difference
    * between shuffling the whole fact table and shuffling only the slice
    * that can match a filtered dimension. Production defaults already
    * enable it (creation side ≤ 10 MB plan size, application side ≥ 10 GB
    * scanned — the scale where the filter pays for itself); the demo only
    * drops the application-side floor so a fixture-sized fact qualifies,
    * and disables broadcast so the shuffle the filter protects actually
    * exists. */
  val runtimeFilterDemoConfs: Seq[(String, String)] = Seq(
    "spark.sql.autoBroadcastJoinThreshold" -> "-1",
    "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0")

  object Bucketing {

    /** Persist `df` bucketed (and sorted) on `key` into the session
      * warehouse. Subsequent equi-joins between tables bucketed with the
      * same count on the same key need no shuffle.
      */
    def writeBucketed(df: DataFrame, table: String, key: String,
        numBuckets: Int): Unit = {
      val spark = df.sparkSession
      // parse (and thereby validate) the identifier; the catalog maps it to
      // the real managed location (lowercasing, db.tbl → <db>.db/<tbl>) so
      // the orphan cleanup below can never touch an unrelated directory
      val ident = spark.sessionState.sqlParser.parseTableIdentifier(table)
      spark.sql(s"DROP TABLE IF EXISTS ${ident.quotedString}")
      // a previously interrupted write can leave an orphaned managed
      // location behind; clear it or CREATE TABLE refuses. Hadoop's
      // FileSystem resolves the warehouse URI whatever its scheme
      // (file:, hdfs:, s3a:, ...) — java.io.File would throw on any
      // non-local warehouse.
      val loc = new org.apache.hadoop.fs.Path(
        spark.sessionState.catalog.defaultTablePath(ident))
      val fs = loc.getFileSystem(spark.sparkContext.hadoopConfiguration)
      if (fs.exists(loc)) fs.delete(loc, true)
      df.write.mode(SaveMode.Overwrite)
        .bucketBy(numBuckets, key)
        .sortBy(key)
        .format("parquet")
        .saveAsTable(table)
    }

    def table(spark: SparkSession, name: String): DataFrame =
      spark.table(name)
  }

  /** Key-skew PROFILE — measure before you salt: one map-side-combinable
    * count per key, then key-relation-sized statistics. `max_key_frac`
    * and `hot_key` say whether ONE reducer would drown (the salting
    * trigger); `entropy_ratio` (key entropy / ln n_keys, 1.0 = uniform)
    * says how lopsided the whole distribution is; `recommended_salts` is
    * the ⌈hot/avg⌉ split factor that levels the hottest reducer with the
    * average — exactly the `numSalts` [[saltedAggregate]]/[[saltedJoin]]
    * take. This is the q158 move for the shuffle layer: the routing
    * number is measured BEFORE the expensive job runs, not discovered in
    * a straggler.
    *
    * hot_key is the (count, key)-argmax — deterministic under count
    * ties. Entropy is Σ −p·ln p over the key relation, rounded at 4dp
    * (the summation is key-relation-sized; both engines agree well past
    * the rounding boundary).
    */
  def keySkewProfile(df: DataFrame, keyCol: String): DataFrame = {
    val counts = df.groupBy(col(keyCol).as("k"))
      .agg(count(lit(1)).as("c"))
    counts
      .agg(count(lit(1)).as("n_keys"),
        sum(col("c")).as("n_rows"),
        max(struct(col("c"), col("k"))).as("hot"),
        sum(-col("c") * log(col("c"))).as("sclogc"))
      .select(col("n_keys"), col("n_rows"),
        col("hot.k").as("hot_key"), col("hot.c").as("hot_count"),
        round(col("hot.c") / col("n_rows"), 6).as("max_key_frac"),
        when(col("n_keys") > 1,
          round((col("sclogc") / col("n_rows") + log(col("n_rows"))) /
            log(col("n_keys")), 4))
          .otherwise(lit(0.0)).as("entropy_ratio"),
        // hot·n_keys in DOUBLE, not long×long: at the 100 TB envelope
        // this operator targets (1e12 rows × 1e9 keys) the long product
        // overflows — ANSI mode throws, non-ANSI silently wraps. The
        // oracle computes the same double chain.
        ceil(col("hot.c").cast("double") * col("n_keys") / col("n_rows"))
          .cast("long").as("recommended_salts"))
  }
}
