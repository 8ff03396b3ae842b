package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import graft.functions.GraftFunctions

/** Materialized IVF index store — the ANN analogue of
  * [[graft.export.ShardStore]]: v6/v10 rebuild their inverted-file index
  * inline on every query, which is the right shape for a one-shot batch
  * job but not for SERVING, where the index is built once and probed many
  * times. This sink persists the index partitioned BY INVERTED LIST so a
  * probe reads only its nProbe directories.
  *
  * Layout, both choices load-bearing at 100 TB:
  *   - `partitionBy(cid)`: a probe touches nProbe/k of the index as
  *     DIRECTORY pruning — the `cid IN (...)` filter shows up as
  *     PartitionFilters, so unprobed lists are never opened (pinned in
  *     VectorIndexSinkSpec). This is the storage-layout upgrade of v6's
  *     "queries touch nProbe/k of the data" argument.
  *   - rows at rest carry the int8 codes + norm (v8's 4× byte cut — the
  *     coarse pass reads only these) alongside the full-precision vector
  *     for survivor re-rank. At production scale the full-precision
  *     column would split into its own point-lookup table; one table
  *     keeps the test honest without changing either plan shape.
  *
  * The centroid table (k rows) is persisted beside the index — the probe
  * side needs nothing else, so an index built once serves any number of
  * later query batches (asserted by the spec probing a freshly-read
  * table). Overwrite semantics mirror ShardStore: drop-and-rewrite, the
  * batch equivalent of the reference's truncate-then-load sink
  * (`/root/reference/public_data_report/hardware_report/hardware_report.py:459-465`).
  */
object VectorIndexStore {

  /** Build the IVF index from `emb` (id-seeded deterministic Lloyd — the
    * exact v6/v10 build) and persist `table` (inverted lists, partitioned
    * by cid) plus `table_centroids` (k rows). */
  def write(emb: DataFrame, table: String, nLists: Int = IvfAnn.k): Unit = {
    val spark = emb.sparkSession
    import spark.implicits._
    GraftFunctions.register(spark)
    // Lloyd runs EXACTLY once: collect the k centroids, then write the
    // tiny table from the collected rows — materializing the centroid
    // DataFrame twice (write + collect) would run the whole iterative
    // build a second time
    val centArr = IvfAnn.collectCents(IvfAnn.centroids(emb, nLists))
    spark.sql(s"DROP TABLE IF EXISTS ${table}_centroids")
    centArr.toSeq
      .toDF("cid", "centroid")
      .write
      .saveAsTable(s"${table}_centroids")
    val indexed = IvfAnn
      .assignTo(centArr)(emb)
      .withColumn(
        "qf",
        call_function("graft_quantize_int8", col("embedding")).cast("array<float>")
      )
      .withColumn("qn", sqrt(call_function("graft_dot", col("qf"), col("qf"))))
    spark.sql(s"DROP TABLE IF EXISTS $table")
    indexed.write.partitionBy("cid").saveAsTable(table)
  }

  /** Probe the materialized index with a batch of (vec_id, embedding)
    * queries: nProbe nearest lists per query, coarse rank on the stored
    * int8 codes, exact re-rank of the top-10 survivors — v10's serving
    * plan, except the probed lists come from partition pruning on the
    * stored table instead of an inline full-index rebuild. Output is
    * bit-identical to [[IvfAnn.queryQuantized]] on the same data (the
    * build is deterministic; the spec asserts equality). */
  def probe(spark: SparkSession, table: String, queries: DataFrame): DataFrame =
    probeIndex(spark, s"${table}_centroids", withoutTombstones(spark, table, spark.table(table)), queries)

  /** Serving view while streamed arrivals sit in a delta directory
    * awaiting compaction ([[graft.streaming.StreamingIndexUpsert]]): the
    * probe scans base ∪ delta, and BOTH sides prune on cid — the delta's
    * (epoch, cid) layout keeps the list id a partition column, so unprobed
    * lists stay unopened in either store.
    *
    * Reader/writer boundary, stated honestly (round-9 review): raw
    * parquet has no snapshot isolation, so a probe that lists the delta
    * while [[writeDelta]] dynamic-overwrites a replayed epoch (or
    * [[compact]] deletes folded epoch dirs) can fail TRANSIENTLY with a
    * files-changed-underneath read error — it cannot return wrong rows,
    * only fail loudly and retry. Run maintenance verbs from the single
    * maintenance job (the compact contract) and retry probes around a
    * compaction window; the production-grade swap is the same one
    * compact's crash note names — a table format with snapshot
    * isolation (Iceberg/Delta-class) under the identical layout. */
  def probeWithDelta(
      spark: SparkSession,
      table: String,
      deltaDir: String,
      queries: DataFrame
  ): DataFrame = {
    // project both stores to the serving columns before the union: the
    // base may carry extra payload columns the arrivals never had
    val serving = Seq("vec_id", "embedding", "qf", "qn", "cid").map(col)
    val base = spark.table(table).select(serving: _*)
    // a missing or empty delta is a NORMAL lifecycle state (before the
    // first micro-batch; right after compact clears it) — serve the base
    // alone rather than failing schema inference on nothing
    val root = new org.apache.hadoop.fs.Path(deltaDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasDelta = fs.exists(root) &&
      fs.listStatus(root).exists(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
    val index =
      if (hasDelta) base.unionByName(spark.read.parquet(deltaDir).select(serving: _*))
      else base
    probeIndex(spark, s"${table}_centroids", withoutTombstones(spark, table, index), queries)
  }

  /** DELETE — the index-lifecycle verb between upsert and refit:
    * tombstone the given ids (one-column `vec_id` frame) so the very
    * next probe neither serves them nor lets them consume top-k slots.
    * Logical-first (the LSM discipline): the tombstone table is tiny and
    * broadcast into an anti-join ahead of ranking, while the resident
    * lists stay untouched until [[purge]] — deleting must never cost a
    * 100 TB rewrite. Re-deleting an id, or deleting an unknown id, is
    * harmless (the anti-join doesn't care about duplicates or misses).
    *
    * Contract note, stated honestly: a tombstone suppresses the ID, and
    * while it stands a re-insert of that id is DROPPED — [[upsert]] and
    * [[writeDelta]] both anti-join arrivals against the tombstone table,
    * so the drop is deterministic, not dependent on whether the old row
    * is still physical. Delete-then-reinsert as a live pattern is
    * purge-first: run [[purge]] (retires the tombstone once the old row
    * is physically gone), then upsert — the spec pins that sequence.
    * Epoch-aware tombstones are the upgrade if the two must interleave
    * without an intervening purge. */
  def delete(spark: SparkSession, table: String, ids: DataFrame): Unit = {
    import spark.implicits._
    ids
      .select(col("vec_id").cast("long"))
      .as[Long]
      .toDF("vec_id")
      .write
      .mode("append")
      .saveAsTable(s"${table}_tombstones")
  }

  /** The serving view minus tombstoned ids — a broadcast LEFT ANTI ahead
    * of ranking (tombstones are small by lifecycle contract; a tombstone
    * set growing toward list size is the purge signal). No tombstone
    * table = nothing deleted = the index as-is. */
  private def withoutTombstones(
      spark: SparkSession,
      table: String,
      index: DataFrame
  ): DataFrame =
    if (spark.catalog.tableExists(s"${table}_tombstones"))
      index.join(
        broadcast(spark.table(s"${table}_tombstones")),
        Seq("vec_id"),
        "left_anti"
      )
    else index

  /** PURGE — fold the tombstones into the physical store: rewrite ONLY
    * the list partitions that contain tombstoned rows (dynamic partition
    * overwrite; untouched lists are never read or written), explicitly
    * drop partitions the deletes emptied (dynamic overwrite writes
    * nothing for an empty partition, which would leave stale files),
    * then retire the tombstones. The rule is SUPPRESSION-DRIVEN: a
    * tombstone survives iff its id still sits in one of the `deltaDirs`'
    * un-compacted epochs (pass every registered delta dir — the caller
    * contract; retiring a delta-resident tombstone would resurrect its
    * row in [[probeWithDelta]]); every other tombstone retires — folded
    * base ids because the rewrite just removed their rows, and ids
    * resident NOWHERE because there is nothing left to suppress. The
    * nowhere case matters twice: deleting a never-indexed id must be a
    * no-op once purged (not a permanent block on its future insert — the
    * round-9 review caught the earlier (tomb ∖ base) rule making exactly
    * that mistake), and purge's own documented crash-rerun (die between
    * the base rewrite and the retire, run purge again) must retire the
    * already-folded ids rather than trap them forever.
    *
    * Everything scales by the TOMBSTONE set, never the index: the
    * surviving-tombstone frame (tomb ∩ delta-residents) is broadcast
    * semi-joins of the tiny tombstone table and is STAGED to parquet
    * before the base rewrite — no per-id driver collect anywhere in the
    * verb, so a bulk (GDPR-style) delete purges in one pass without
    * driver memory scaling (the bulk-delete spec runs one). The one
    * collected value is the touched-cid list, bounded by k. Finding the
    * touched lists costs ONE index-wide semi-join on vec_id — purge is
    * the rare maintenance event (compact's cadence, not the probe path).
    * Same append/delete crash boundary as [[compact]]: run from a single
    * maintenance job; the tombstone rewrite itself is a single overwrite
    * (no drop-then-create window that could lose surviving tombstones).
    *
    * `deltaDirs` has NO default on purpose: a caller who forgets an
    * active delta dir would retire its resident tombstones and silently
    * resurrect deleted rows in [[probeWithDelta]] — a table with no
    * delta spells `Seq.empty` at the call site, making "I considered the
    * deltas" explicit in every invocation. */
  def purge(spark: SparkSession, table: String, deltaDirs: Seq[String]): Unit = {
    if (!spark.catalog.tableExists(s"${table}_tombstones")) return
    val tomb = broadcast(spark.table(s"${table}_tombstones").select("vec_id").distinct())
    val base = spark.table(table)
    // ids still present in an un-compacted delta epoch keep their
    // tombstones; everything else retires (see Scaladoc)
    val deltaResident = deltaDirs
      .flatMap { dir =>
        val root = new org.apache.hadoop.fs.Path(dir)
        val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val hasEpochs = fs.exists(root) &&
          fs.listStatus(root).exists(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
        if (hasEpochs) Some(spark.read.parquet(dir).select("vec_id")) else None
      }
      .reduceOption(_ unionByName _)
    // survivors = tomb ∩ delta; must be STAGED before the rewrite (and
    // before the retire overwrite reads it back)
    val survivors = deltaResident match {
      case Some(d) => tomb.join(d, Seq("vec_id"), "left_semi")
      case None => tomb.limit(0)
    }
    val tombStaging = new org.apache.hadoop.fs.Path(
      spark.conf.get("spark.sql.warehouse.dir"),
      s"${table}_tombstone_staging"
    )
    val tfs = tombStaging.getFileSystem(spark.sparkContext.hadoopConfiguration)
    survivors.write.mode("overwrite").parquet(tombStaging.toString)
    // the ONE index-wide pass of the verb: which lists hold doomed rows
    val touchedCids = base
      .join(tomb, Seq("vec_id"), "left_semi")
      .select("cid")
      .distinct()
      .collect()
      .map(_.getInt(0))
    if (touchedCids.nonEmpty) {
      val touched = base.filter(col("cid").isin(touchedCids.map(Integer.valueOf): _*))
      // Spark refuses to overwrite a table it is reading from, so the
      // survivors of the touched lists STAGE to a scratch dir first —
      // sized by the touched partitions, never the index
      val staging = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        s"${table}_purge_staging"
      )
      val sfs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
      touched
        .join(tomb, Seq("vec_id"), "left_anti")
        .write
        .mode("overwrite")
        .parquet(staging.toString)
      val survivors = spark.read.parquet(staging.toString)
      val liveCids = survivors.select("cid").distinct().collect().map(_.getInt(0)).toSet
      // insertInto (NOT saveAsTable): saveAsTable-overwrite replaces the
      // whole table; insertInto under dynamic partition overwrite rewrites
      // only the partitions present in `survivors`. The catalog-table
      // insert reads the SESSION conf, not the writer option (the writer
      // option only reaches path-based writes) — set and restore it.
      // Position-based, so align to the table's column order explicitly.
      val pomKey = "spark.sql.sources.partitionOverwriteMode"
      val prevPom = spark.conf.get(pomKey, "STATIC")
      spark.conf.set(pomKey, "dynamic")
      try {
        survivors
          .select(spark.table(table).columns.toIndexedSeq.map(col): _*)
          .write
          .mode("overwrite")
          .insertInto(table)
      } finally spark.conf.set(pomKey, prevPom)
      sfs.delete(staging, true)
      touchedCids.filterNot(liveCids).foreach { c =>
        spark.sql(s"ALTER TABLE $table DROP IF EXISTS PARTITION (cid=$c)")
      }
    }
    // retire the folded tombstones by OVERWRITING INTO the existing
    // table — insertInto, NOT saveAsTable: saveAsTable-overwrite on a
    // managed table is internally drop-then-recreate, so a crash between
    // the two would lose the surviving (delta-only/unknown-id)
    // tombstones AND the table itself, and a purge re-run would no-op at
    // the tableExists guard — silently un-deleting those rows.
    // insertInto keeps the table metadata standing at every instant and
    // the staged parquet is deleted only after the insert returns; an
    // empty survivor set overwrites to an empty table (truncate
    // semantics), which the probe anti-join treats as nothing-deleted.
    // Residual boundary is compact's, stated there: a crash INSIDE the
    // insert can leave partial survivor data — run purge from a single
    // maintenance job.
    spark.read
      .parquet(tombStaging.toString)
      .write
      .mode("overwrite")
      .insertInto(s"${table}_tombstones")
    tfs.delete(tombStaging, true)
  }

  private def probeIndex(
      spark: SparkSession,
      centroidTable: String,
      indexRows: DataFrame,
      queries: DataFrame
  ): DataFrame = {
    GraftFunctions.register(spark)
    val centArr = IvfAnn.collectCents(spark.table(centroidTable))
    val q = queries
      .withColumn(
        "query_qf",
        call_function("graft_quantize_int8", col("embedding")).cast("array<float>")
      )
      .withColumn(
        "query_qn",
        sqrt(call_function("graft_dot", col("query_qf"), col("query_qf")))
      )
      .select(
        col("vec_id").as("qid"),
        col("embedding").as("qe"),
        col("query_qf"),
        col("query_qn")
      )
    val probes = IvfAnn.withProbedCids(centArr, "qe")(q)
    // the distinct probed-list ids are bounded by k (16) — a driver-side
    // collect of a handful of ints, which is what turns the probe into a
    // partition-pruning literal the scan can use
    val probedCids = probes.select("cid").distinct().collect().map(_.getInt(0)).sorted
    val index = indexRows.filter(col("cid").isin(probedCids.map(Integer.valueOf): _*))
    val wc = Window.partitionBy("qid").orderBy(col("qcos").desc, col("vec_id").asc)
    val wr = Window.partitionBy("qid").orderBy(col("cos").desc, col("vec_id").asc)
    broadcast(probes)
      .join(index, Seq("cid"))
      .filter(col("vec_id") =!= col("qid"))
      .withColumn(
        "qcos",
        call_function("graft_dot", col("query_qf"), col("qf")) /
          (col("query_qn") * col("qn"))
      )
      .withColumn("crn", row_number().over(wc))
      .filter(col("crn") <= 10)
      .withColumn(
        "cos",
        call_function("graft_dot", col("qe"), col("embedding")) /
          (sqrt(call_function("graft_dot", col("qe"), col("qe"))) *
            sqrt(call_function("graft_dot", col("embedding"), col("embedding"))))
      )
      .withColumn("rnk", row_number().over(wr).cast("long"))
      .filter(col("rnk") <= 5)
      .select(col("qid").as("query_id"), col("rnk"), col("vec_id").as("neighbor_id"))
      .orderBy("query_id", "rnk")
  }

  /** Project `df` onto `base`'s schema, null-filling payload columns the
    * arrivals never carried — serving reads only (vec_id, embedding, qf,
    * qn, cid), so extra base columns are metadata a batch needn't have. */
  private def alignTo(base: DataFrame, df: DataFrame): DataFrame =
    df.select(
      base.columns.toIndexedSeq.map { c =>
        if (df.columns.contains(c)) col(c)
        else lit(null).cast(base.schema(c).dataType).as(c)
      }: _*
    )

  /** Append an arriving batch to a persisted index WITHOUT refit —
    * [[IvfAnn.upsert]]'s contract made durable. The increment is assigned
    * to the STORED centroids (collected from the table, not refit),
    * quantized like the resident rows, and appended to its list
    * partitions; the centroid table and every existing assignment are
    * untouched, so earlier probes stay valid and new rows become servable
    * by the very next probe.
    *
    * Retry-safe: arrivals whose vec_id is already resident ANYWHERE in
    * the base are dropped by an anti-join before the append — the guard
    * reads the base's vec_id column index-WIDE, not just the arrival's
    * target lists, because a re-delivered id does not necessarily land
    * in its old list (its embedding may have changed, or
    * [[rebalance]] may have moved the centroids), and a touched-lists-
    * only check would seat the same vec_id in two lists permanently
    * (the round-9 review's scenario; probes touching both lists would
    * then serve the id at two ranks). Arrivals sitting in an
    * un-compacted delta epoch are dropped for the same reason when the
    * caller registers its `deltaDirs` ([[writeDelta]]'s mirror guard —
    * base∧delta co-residency would double-serve in [[probeWithDelta]]).
    * Tombstoned ids are dropped by a further (broadcast) anti-join —
    * deterministically, not only while the old row is still physical —
    * keeping [[delete]]'s purge-first re-insert contract honest.
    *
    * Scale shape: one k-row centroid read + the shuffle-free codegen
    * argmin over the increment; the append touches only the ≤k list
    * partitions the arrivals land in. The residency guard costs one
    * column-pruned vec_id scan of the base — long-column I/O on the
    * MAINTENANCE path, the price of the no-duplicate invariant under
    * embedding drift; the payload columns are never read. */
  def upsert(
      spark: SparkSession,
      table: String,
      increment: DataFrame,
      deltaDirs: Seq[String] = Nil
  ): Unit = {
    GraftFunctions.register(spark)
    val centArr = IvfAnn.collectCents(spark.table(s"${table}_centroids"))
    val indexed = IvfAnn
      .assignTo(centArr)(increment)
      .withColumn(
        "qf",
        call_function("graft_quantize_int8", col("embedding")).cast("array<float>")
      )
      .withColumn("qn", sqrt(call_function("graft_dot", col("qf"), col("qf"))))
    // no cache: `indexed` is consumed exactly once (the guarded append) —
    // the arrival-cid collect this cache once amortized is gone
    locally {
      val residents = spark.table(table).select("vec_id")
      val deltaResidents = deltaDirs
        .flatMap { dir =>
          val root = new org.apache.hadoop.fs.Path(dir)
          val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
          val hasEpochs = fs.exists(root) &&
            fs.listStatus(root).exists(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
          if (hasEpochs) Some(spark.read.parquet(dir).select("vec_id")) else None
        }
        .reduceOption(_ unionByName _)
      val guarded = deltaResidents match {
        case Some(d) =>
          indexed
            .join(residents, Seq("vec_id"), "left_anti")
            .join(d, Seq("vec_id"), "left_anti")
        case None => indexed.join(residents, Seq("vec_id"), "left_anti")
      }
      val fresh = withoutTombstonedIds(spark, table, guarded)
      alignTo(spark.table(table), fresh).write
        .partitionBy("cid")
        .mode("append")
        .saveAsTable(table)
    }
  }

  /** Drop rows whose vec_id is currently tombstoned — the ingest-side
    * guard that makes the delete contract deterministic for [[upsert]]
    * and [[writeDelta]] alike. */
  private def withoutTombstonedIds(
      spark: SparkSession,
      table: String,
      rows: DataFrame
  ): DataFrame =
    if (spark.catalog.tableExists(s"${table}_tombstones"))
      rows.join(
        broadcast(spark.table(s"${table}_tombstones")),
        Seq("vec_id"),
        "left_anti"
      )
    else rows

  /** Idempotent delta writer for CONTINUOUS maintenance
    * ([[graft.streaming.StreamingIndexUpsert]] wires it to a stream):
    * assign `batch` to `table`'s stored centroids and (re)write its
    * (epoch, cid) partitions in `deltaDir`. Dynamic partition overwrite +
    * one epoch per micro-batch makes a checkpoint replay REPLACE its own
    * partitions instead of duplicating rows — the append-sink analogue of
    * [[graft.streaming.StreamingSnapshot.writeSnapshot]]'s truncate
    * argument. Keeping cid a partition column means
    * [[probeWithDelta]] prunes unprobed lists in the delta too.
    *
    * Same ingest guards as [[upsert]] (index-wide vec_id reads — see
    * upsert's Scaladoc for why pruning them to touched lists is wrong):
    * arrivals already resident in the base are dropped (a
    * base∧delta co-resident id would be served twice by
    * [[probeWithDelta]] and double-folded by [[compact]]; it would also
    * let [[purge]] retire a tombstone whose id still lives in the
    * delta), arrivals already sitting in an EARLIER delta epoch are
    * dropped (a re-delivered duplicate arrival file would otherwise seat
    * the id in two epochs — this epoch's own rows are exempt so a
    * checkpoint replay still replaces itself), and tombstoned ids are
    * dropped per [[delete]]'s contract. */
  def writeDelta(batch: DataFrame, table: String, deltaDir: String, epoch: Long): Unit = {
    val spark = batch.sparkSession
    GraftFunctions.register(spark)
    val centArr = IvfAnn.collectCents(spark.table(s"${table}_centroids"))
    val indexed = IvfAnn
      .assignTo(centArr)(batch)
      .withColumn(
        "qf",
        call_function("graft_quantize_int8", col("embedding")).cast("array<float>")
      )
      .withColumn("qn", sqrt(call_function("graft_dot", col("qf"), col("qf"))))
    // no cache: the only other "read" of `indexed` is a limit(0) used for
    // schema shape in the no-epochs branch — never executed as a job
    // residency guards read vec_id index-WIDE, not pruned to the
    // arrival's target lists: a re-delivered id whose embedding changed
    // (or whose list moved under rebalance) lands in a DIFFERENT cid, so
    // a touched-lists-only check would miss the old copy and seat the id
    // twice (upsert's round-9 review scenario, same fix here)
    locally {
      val residents = spark.table(table).select("vec_id")
      // arrivals already sitting in an EARLIER delta epoch are dropped too
      // (a duplicate arrival file re-delivered in a later micro-batch would
      // otherwise seat the id in two epochs: probeWithDelta would serve it
      // twice and compact would double-seat it in the base). THIS epoch is
      // excluded from the residency check on purpose — a checkpoint replay
      // must REPLACE its own partitions via dynamic overwrite, not
      // anti-join itself out and leave the prior partial attempt standing.
      val deltaResidents = {
        val root = new org.apache.hadoop.fs.Path(deltaDir)
        val dfs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
        val hasEpochs = dfs.exists(root) &&
          dfs.listStatus(root).exists(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
        if (hasEpochs)
          spark.read
            .parquet(deltaDir)
            .filter(col("epoch") =!= epoch)
            .select("vec_id")
        else indexed.select("vec_id").limit(0)
      }
      withoutTombstonedIds(
        spark,
        table,
        indexed
          .join(residents, Seq("vec_id"), "left_anti")
          .join(deltaResidents, Seq("vec_id"), "left_anti")
      )
        .withColumn("epoch", lit(epoch))
        .write
        .mode("overwrite")
        .option("partitionOverwriteMode", "dynamic")
        .partitionBy("epoch", "cid")
        .parquet(deltaDir)
    }
  }

  /** Fold the delta into the base index and clear it — compaction, run
    * when the delta's size has grown past its read-amplification budget
    * (v20's ledger is the signal). Compaction MOVES rows; it never
    * re-assigns them (centroids untouched), so probe results are
    * identical before and after — a refit is the separate, rarer event
    * that drift schedules. Payload columns the arrivals never carried
    * (the base keeps its input schema) are null-filled: serving reads
    * only (vec_id, embedding, qf, qn, cid).
    *
    * Safe against a LIVE writer: the epochs to fold are snapshotted
    * FIRST, only those epochs' rows are appended, and only those epoch
    * directories are deleted — a micro-batch landing a new epoch while
    * compaction runs is untouched and simply waits for the next compact.
    *
    * Crash boundary, stated honestly: append-then-delete is still two
    * steps — a crash between them leaves the folded epochs in BOTH
    * stores, and re-running compact would double them. A transactional
    * table commit is the real fix; on plain parquet, run compact from a
    * single maintenance job and verify the ledger (v20 new_size vs base
    * counts) before re-running after a crash. */
  def compact(spark: SparkSession, table: String, deltaDir: String): Unit = {
    val root = new org.apache.hadoop.fs.Path(deltaDir)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(root)) return
    val epochDirs = fs
      .listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("epoch="))
    if (epochDirs.isEmpty) return
    val epochs = epochDirs.map(_.getPath.getName.stripPrefix("epoch=").toLong)
    val base = spark.table(table)
    // dedup WITHIN the fold, newest epoch wins: writeDelta anti-joins
    // arrivals against earlier epochs at ingest, but the fold verifies
    // rather than assumes (a delta written by an older library version,
    // or a race between two writers, could still hold an id twice) —
    // without this a cross-epoch duplicate would seat the same vec_id
    // twice in the base. The window is delta-sized, never index-sized.
    val dw = org.apache.spark.sql.expressions.Window
      .partitionBy("vec_id")
      .orderBy(col("epoch").desc)
    val folded = spark.read
      .parquet(deltaDir)
      .filter(col("epoch").isin(epochs.map(java.lang.Long.valueOf): _*))
      .withColumn("rn", row_number().over(dw))
      .filter(col("rn") === 1)
      .drop("rn", "epoch")
    // [[writeDelta]] guards base∧delta co-residency at ingest; verify it
    // here too (an upsert can land an id AFTER it entered the delta) so a
    // fold can never seat the same vec_id twice in the base. The
    // residents read prunes to the delta's own cid partitions.
    val deltaCids = folded.select("cid").distinct().collect().map(_.getInt(0))
    val residents = base
      .filter(col("cid").isin(deltaCids.map(Integer.valueOf): _*))
      .select("vec_id")
    val fresh = folded.join(residents, Seq("vec_id"), "left_anti")
    alignTo(base, fresh).write.partitionBy("cid").mode("append").saveAsTable(table)
    epochDirs.foreach(s => fs.delete(s.getPath, true))
  }

  /** REBALANCE — split oversized inverted lists IN PLACE, the skew-repair
    * verb between [[compact]] and a full refit. Probe cost is
    * proportional to probed-list size, so a list that upserts have grown
    * hot degrades every query that probes it; a full Lloyd refit
    * rewrites the entire index to fix a handful of lists. Rebalance
    * reads ONLY the hot partitions (size > `maxListFactor` × median,
    * sizes from one k-row count agg), runs a deterministic grouped
    * 2-means inside each (seeds = a deterministic farthest-pair
    * approximation,
    * [[IvfAnn.lloydIters]] iterations, all DataFrame ops with the
    * bounded 2·|hot| sub-centroid collect the IvfAnn design allows),
    * and rewrites just those partitions under dynamic partition
    * overwrite — untouched lists are never read or written.
    *
    * Ordering is crash-considered: the centroid table is updated FIRST
    * (a centroid with a momentarily empty/absent list probes harmlessly;
    * the reverse order would leave moved rows unreachable). Contract:
    * run AFTER [[compact]] (delta epochs are keyed by old cids) and from
    * a single maintenance job, like the other rewrite verbs. The indexed
    * SET is preserved exactly — no vector lost or duplicated
    * (spec-pinned) — while list BOUNDARIES move, which changes which
    * lists a fixed nProbe probes: the spec gates that measured recall
    * does not degrade on the skewed fixture. A hot list of
    * near-identical vectors yields a degenerate split (one empty sub)
    * and is left untouched — that is duplication, not skew; dedup is
    * m7b's job, not the index layout's.
    *
    * A 2-means pass halves a hot list, which can still exceed the
    * threshold (a 10×-median list needs two halvings), so rebalance
    * LOOPS passes until no repairable list remains: each pass re-reads
    * the k-row size frame, splits every currently-hot list once, and
    * lists whose split came back degenerate are excluded from later
    * passes (they can never split — without the exclusion an
    * all-identical hot list would loop forever). Pass count is bounded
    * by log2(maxSize/median) — each pass halves the worst list — with a
    * hard cap as a backstop. One call therefore leaves the invariant
    * `every splittable list ≤ maxListFactor × median` true, and an
    * immediately repeated call is a no-op (spec-pinned).
    *
    * Returns the performed splits as (oldCid, newCid). */
  def rebalance(
      spark: SparkSession,
      table: String,
      maxListFactor: Double = 4.0
  ): Seq[(Int, Int)] = {
    val done = scala.collection.mutable.ArrayBuffer.empty[(Int, Int)]
    val degenerate = scala.collection.mutable.Set.empty[Int]
    var pass = 0
    var progressed = true
    while (progressed && pass < 32) {
      pass += 1
      val splits = rebalancePass(spark, table, maxListFactor, degenerate)
      done ++= splits
      progressed = splits.nonEmpty
    }
    done.toSeq
  }

  /** One split pass of [[rebalance]]: splits each currently-hot list
    * (excluding known-degenerate cids) exactly once. Adds cids whose
    * 2-means collapsed to `degenerate`. */
  private def rebalancePass(
      spark: SparkSession,
      table: String,
      maxListFactor: Double,
      degenerate: scala.collection.mutable.Set[Int]
  ): Seq[(Int, Int)] = {
    GraftFunctions.register(spark)
    import spark.implicits._
    val sizes = spark
      .table(table)
      .groupBy("cid")
      .count()
      .collect()
      .map(r => r.getInt(0) -> r.getLong(1))
    if (sizes.isEmpty) return Nil
    val med = sizes.map(_._2).sorted.apply(sizes.length / 2)
    val hot = sizes
      .filter { case (c, n) => n > maxListFactor * math.max(1L, med) && !degenerate.contains(c) }
      .map(_._1)
    if (hot.isEmpty) return Nil
    // new list ids must clear BOTH tables' cids: purge drops emptied data
    // partitions but leaves their centroid rows, so max over the data
    // table alone could re-allocate an existing (empty-list) centroid's
    // cid and seat two _centroids rows under one id
    val maxCid = math.max(
      sizes.map(_._1).max,
      spark
        .table(s"${table}_centroids")
        .agg(max("cid"))
        .collect()(0)
        .getInt(0)
    )
    val hotRows = spark
      .table(table)
      .filter(col("cid").isin(hot.map(Integer.valueOf): _*))
      .cache()
    try {
      // Seeding is a deterministic farthest-pair approximation, not the
      // two lowest ids: seed A = the list's lowest vec_id, seed B = the
      // point farthest from A (ties by vec_id). Id-adjacent rows are
      // often near-duplicates (any tie-free pair works for k-means, but
      // two coincident seeds collapse the split), whereas A→farthest
      // spans the list's real diameter, so a list with ANY spread gets a
      // viable split; a truly degenerate all-identical list still
      // collapses and is deliberately left untouched.
      val ws = Window.partitionBy("cid").orderBy("vec_id")
      val seedA = hotRows
        .withColumn("rn", row_number().over(ws))
        .filter(col("rn") === 1)
        .select(col("cid"), col("embedding").as("seed_a"))
      val wf = Window
        .partitionBy("cid")
        .orderBy(col("d2a").desc, col("vec_id"))
      val seedB = hotRows
        .join(broadcast(seedA), Seq("cid"))
        .withColumn("d2a", call_function("graft_dist2", col("embedding"), col("seed_a")))
        .withColumn("rn", row_number().over(wf))
        .filter(col("rn") === 1)
        .select(col("cid"), col("embedding").as("seed_b"))
      var subCents = seedA
        .withColumnRenamed("seed_a", "centroid")
        .withColumn("sub", lit(0))
        .unionByName(
          seedB.withColumnRenamed("seed_b", "centroid").withColumn("sub", lit(1))
        )
        .select(col("cid"), col("sub"), col("centroid"))
      def assignSubs(cents: DataFrame): DataFrame = {
        val wa = Window.partitionBy("cid", "vec_id").orderBy(col("d2"), col("sub"))
        hotRows
          .join(broadcast(cents), Seq("cid"))
          .withColumn("d2", call_function("graft_dist2", col("embedding"), col("centroid")))
          .withColumn("rnk", row_number().over(wa))
          .filter(col("rnk") === 1)
          .drop("d2", "rnk", "centroid")
      }
      (0 until IvfAnn.lloydIters).foreach { _ =>
        subCents = assignSubs(subCents)
          .select(col("cid"), col("sub"), posexplode(col("embedding")).as(Seq("dim", "x")))
          .groupBy("cid", "sub", "dim")
          .agg(avg("x").as("mean"))
          .groupBy("cid", "sub")
          .agg(
            transform(
              array_sort(collect_list(struct(col("dim"), col("mean")))),
              e => e.getField("mean").cast("float")
            ).as("centroid")
          )
      }
      val assigned = assignSubs(subCents).cache()
      try {
      // a split is viable only if BOTH subs are non-empty
      val viable = assigned
        .groupBy("cid")
        .agg(countDistinct("sub").as("nsubs"))
        .filter(col("nsubs") === 2)
        .select("cid")
        .collect()
        .map(_.getInt(0))
        .sorted
      degenerate ++= hot.toSet -- viable
      if (viable.isEmpty) return Nil
      val newCidOf = viable.zipWithIndex.map { case (c, i) => c -> (maxCid + 1 + i) }.toMap
      val cidMap = newCidOf.toSeq
        .map { case (c, n) => (c, n) }
        .toDF("cid", "new_cid")
      val rewritten = assigned
        .join(broadcast(cidMap), Seq("cid"))
        .withColumn("cid", when(col("sub") === 0, col("cid")).otherwise(col("new_cid")))
        .drop("sub", "new_cid")
      // centroids FIRST (see ordering note above): viable old cids get
      // their sub-0 centroid, new cids the sub-1 centroid. The k+h-row
      // frame is COLLECTED before the write (the bounded centroid
      // transfer the IVF design allows) because Spark refuses to
      // overwrite a table its own plan is reading; the rewrite itself is
      // insertInto-overwrite, metadata never dropped.
      val subC = subCents
        .join(broadcast(cidMap), Seq("cid"))
        .withColumn("cid", when(col("sub") === 0, col("cid")).otherwise(col("new_cid")))
        .select(col("cid"), col("centroid"))
      val centSchema = spark.table(s"${table}_centroids").schema
      val keptRows = spark
        .table(s"${table}_centroids")
        .join(broadcast(cidMap), Seq("cid"), "left_anti")
        .unionByName(subC)
        .select(centSchema.fieldNames.toIndexedSeq.map(col): _*)
        .collect()
      spark
        .createDataFrame(
          spark.sparkContext.parallelize(keptRows.toIndexedSeq, 1),
          centSchema
        )
        .write
        .mode("overwrite")
        .insertInto(s"${table}_centroids")
      // the hot-partition rewrite stages to scratch parquet first —
      // purge's pattern, same reason: the frame reads the table it
      // overwrites. Sized by the hot partitions, never the index.
      val staging = new org.apache.hadoop.fs.Path(
        spark.conf.get("spark.sql.warehouse.dir"),
        s"${table}_rebalance_staging"
      )
      val sfs = staging.getFileSystem(spark.sparkContext.hadoopConfiguration)
      rewritten
        .select(spark.table(table).columns.toIndexedSeq.map(col): _*)
        .write
        .mode("overwrite")
        .parquet(staging.toString)
      val pomKey = "spark.sql.sources.partitionOverwriteMode"
      val prevPom = spark.conf.get(pomKey, "STATIC")
      spark.conf.set(pomKey, "dynamic")
      try {
        spark.read
          .parquet(staging.toString)
          .write
          .mode("overwrite")
          .insertInto(table)
      } finally spark.conf.set(pomKey, prevPom)
      sfs.delete(staging, true)
      viable.map(c => c -> newCidOf(c)).toSeq
      // unpersist in finally, not on the happy path: a failed maintenance
      // pass must not leave the hot-partition copy pinned in executor
      // storage for the session's lifetime (round-9 review)
      } finally { assigned.unpersist(); () }
    } finally { hotRows.unpersist(); () }
  }
}
