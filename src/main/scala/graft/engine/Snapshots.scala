package graft.engine

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.hadoop.fs.{FileSystem, Path}

/** Versioned snapshot store with time travel — the minimal table-format
  * core under Delta/Iceberg, as ~100 lines over plain parquet:
  *
  *  - data files are IMMUTABLE: every commit writes a fresh
  *    writer-unique `data/batch-<v>-<nonce>/` directory and never
  *    touches earlier ones;
  *  - a version is a MANIFEST (`_versions/vNNNNN.json`): the list of
  *    data directories visible at that version. Readers list manifests,
  *    never data directories, so a half-written batch is invisible
  *    until its manifest lands;
  *  - manifests are published atomically with create-if-absent (the
  *    optimistic commit protocol Delta uses on its log);
  *  - time travel = read an old manifest. Append vs replace is just
  *    whether the new manifest carries the previous file list.
  *
  * The reference engine has no write path at all; this supplies the
  * missing half of the warehouse story next to MERGE (q55) and
  * compaction (fmt_compaction): q55 computes a new table STATE, this
  * stores states so yesterday's reads still reproduce. All file I/O
  * goes through the Hadoop FileSystem API (object stores work, not
  * just local disk).
  *
  * Scale: a manifest holds directory names, not per-row data — KBs at
  * any table size. Readers cost one small-file read + one parquet scan
  * of exactly the listed directories.
  *
  * CONCURRENCY: commits are optimistic, Delta-style. Every writer
  * stages its data under a writer-unique `data/batch-<v>-<nonce>`
  * directory (no two writers ever touch the same path), then tries to
  * publish the next manifest version with an ATOMIC create-if-absent;
  * the loser of a race re-reads the new latest version, re-carries its
  * file list (for appends), bumps, and retries — so N concurrent
  * committers serialize into N consecutive versions, none lost. On the
  * local filesystem the create-if-absent is a hard-link (POSIX link(2)
  * fails with EEXIST — rename is NOT safe there: File.renameTo silently
  * overwrites); on HDFS-like stores it is rename-without-overwrite.
  * Object stores lacking atomic create-if-absent get best-effort
  * exists-check semantics (the Delta-on-S3 caveat; they need an
  * external commit coordinator for strict safety).
  */
object Snapshots {

  private def fs(spark: SparkSession, dir: String): FileSystem =
    new Path(dir).getFileSystem(spark.sparkContext.hadoopConfiguration)

  private def manifestDir(dir: String) = new Path(s"$dir/_versions")

  private def manifestPath(dir: String, v: Int) =
    new Path(manifestDir(dir), f"v$v%05d.json")

  /** Versions present, ascending; empty if the table doesn't exist. */
  def versions(spark: SparkSession, dir: String): Seq[Int] = {
    val f = fs(spark, dir)
    val md = manifestDir(dir)
    if (!f.exists(md)) Seq.empty
    else f.listStatus(md).toSeq
      .map(_.getPath.getName)
      .collect { case n if n.startsWith("v") && n.endsWith(".json") =>
        n.stripPrefix("v").stripSuffix(".json").toInt }
      .sorted
  }

  def latestVersion(spark: SparkSession, dir: String): Int = {
    val vs = versions(spark, dir)
    require(vs.nonEmpty, s"no snapshot table at $dir")
    vs.last
  }

  /** Commit `df` as the next version. `append = true` keeps the previous
    * version's data directories visible; `false` makes the new batch the
    * whole table (the MERGE/compaction rewrite shape). Returns the new
    * version number.
    *
    * `statsCol`: optionally record the batch's min/max of one LONG
    * column in the manifest line — the Iceberg-style manifest statistic
    * that lets [[readPruned]] skip whole batch directories without
    * opening a single parquet footer at read time. Computed by
    * re-reading the WRITTEN files (one single-column scan at commit
    * time — the once-per-commit price of an envelope that reflects
    * exactly what landed).
    */
  def commit(df: DataFrame, dir: String, append: Boolean,
      statsCol: Option[String] = None): Int = {
    val spark = df.sparkSession
    // fail fast, before any data is written: the manifest envelope
    // format carries LONG min/max
    statsCol.foreach { c =>
      require(df.schema(c).dataType == org.apache.spark.sql.types.LongType,
        s"statsCol '$c' must be LONG, got ${df.schema(c).dataType.simpleString}")
    }
    val f = fs(spark, dir)
    // writer-unique batch directory: a dead writer's leftover is plain
    // garbage (invisible to readers, never collides with a live write),
    // so no reclaim-by-deletion is needed — the pre-r7 reclaim could
    // delete a LIVE second writer's in-flight batch. The version prefix
    // in the name is advisory (the slot this writer first targeted);
    // the manifest, not the name, decides membership.
    val nonce = java.util.UUID.randomUUID().toString.take(8)
    var v = versions(spark, dir).lastOption.map(_ + 1).getOrElse(0)
    val batch = s"data/batch-$v-$nonce"
    df.write.mode("errorifexists").parquet(s"$dir/$batch")
    val entry = statsCol match {
      case None => batch
      case Some(c) =>
        import org.apache.spark.sql.functions.{min, max, col}
        val r = spark.read.parquet(s"$dir/$batch")
          .agg(min(col(c)), max(col(c))).head()
        if (r.isNullAt(0)) batch else s"$batch\t$c\t${r.getLong(0)}\t${r.getLong(1)}"
    }
    // optimistic-commit loop: carry the file list of the version we are
    // rebasing onto (recomputed per attempt — a lost race means someone
    // else's batch landed and an append must now include it too)
    var tries = 0
    var published = false
    while (!published) {
      val carried =
        if (append && v > 0) readManifestEntries(spark, dir, v - 1)
        else Seq.empty
      published = publishIfAbsent(f, dir, v, nonce, carried :+ entry)
      if (!published) {
        tries += 1
        require(tries < 64, s"commit contention: 64 failed publishes at $dir")
        v = math.max(v + 1,
          versions(spark, dir).lastOption.map(_ + 1).getOrElse(0))
      }
    }
    v
  }

  /** Manifest-stats pruned read: batches whose recorded [min, max]
    * envelope on `column` misses [lo, hi] are dropped from the file
    * listing BEFORE any parquet footer is touched — directory-level
    * skipping one level above the parquet row-group stats (which still
    * apply inside the surviving batches). Batches without a recorded
    * envelope are conservatively kept. Results must equal a plain
    * filter at the same version — pruning changes cost, never content —
    * so the residual predicate is always applied.
    */
  def readPruned(spark: SparkSession, dir: String, column: String,
      lo: Long, hi: Long, version: Int = -1,
      mergeSchema: Boolean = false): DataFrame = {
    import org.apache.spark.sql.functions.col
    val v = if (version < 0) latestVersion(spark, dir) else version
    val kept = entriesAt(spark, dir, v).collect {
      case BatchEntry(b, None) => b
      case BatchEntry(b, Some((c, mn, mx)))
        if c != column || (mx >= lo && mn <= hi) => b
    }
    // mergeSchema threads through like read(): on an evolved table the
    // surviving batches may span schemas, and the contract is pruned
    // result == plain filter at the same version — which the plain read
    // only satisfies schema-merged
    val base =
      if (kept.isEmpty) read(spark, dir, v, mergeSchema).limit(0) // schema-preserving empty
      else spark.read.option("mergeSchema", mergeSchema.toString)
        .parquet(kept.map(b => s"$dir/$b"): _*)
    base.filter(col(column) >= lo && col(column) <= hi)
  }

  private case class BatchEntry(batch: String, stats: Option[(String, Long, Long)])

  private def entriesAt(spark: SparkSession, dir: String, v: Int): Seq[BatchEntry] =
    readManifestEntries(spark, dir, v).map { line =>
      line.split('\t') match {
        case Array(b, c, mn, mx) => BatchEntry(b, Some((c, mn.toLong, mx.toLong)))
        case Array(b) => BatchEntry(b, None)
        case other => throw new IllegalStateException(
          s"malformed manifest line: ${other.mkString("\\t")}")
      }
    }

  /** Read the table at `version` (default: latest). `mergeSchema`
    * reconciles batches committed under EVOLVED schemas (a column added
    * by a later append): the merged schema is the union, and rows from
    * batches predating a column read it as null — additive evolution
    * without rewriting history, the same contract as Delta's
    * mergeSchema. Off by default: schema merging reads every batch's
    * footer up front, which a fixed-schema table shouldn't pay.
    */
  def read(spark: SparkSession, dir: String, version: Int = -1,
      mergeSchema: Boolean = false): DataFrame = {
    val v = if (version < 0) latestVersion(spark, dir) else version
    val dirs = entriesAt(spark, dir, v).map(e => s"$dir/${e.batch}")
    spark.read.option("mergeSchema", mergeSchema.toString).parquet(dirs: _*)
  }

  /** Change-data feed between two versions: every row added or removed
    * going vFrom → vTo, tagged `insert` / `delete` (multiset semantics —
    * exceptAll — so duplicate rows diff by count). This is the
    * incremental-consumption path: a downstream job reads the delta
    * between the version it last saw and the current one instead of
    * re-scanning the table. Cost: one scan of each version + the
    * set-difference shuffles; with append-only commits the insert side
    * reduces to reading just the new batch directories.
    */
  def diff(spark: SparkSession, dir: String, vFrom: Int, vTo: Int): DataFrame = {
    import org.apache.spark.sql.functions.{col, lit}
    // read both sides schema-merged and align to the column UNION (a
    // version predating an evolved column contributes nulls) — without
    // this, a diff across an additive-evolution boundary either throws
    // on the exceptAll arity mismatch or silently drops the new column
    // depending on which file Spark sampled for the schema
    val from0 = read(spark, dir, vFrom, mergeSchema = true)
    val to0 = read(spark, dir, vTo, mergeSchema = true)
    val fields = (to0.schema ++ from0.schema.filterNot(f =>
      to0.schema.fieldNames.contains(f.name))).toSeq
    def align(df: DataFrame): DataFrame =
      df.select(fields.map(f =>
        if (df.columns.contains(f.name)) col(f.name)
        else lit(null).cast(f.dataType).as(f.name)): _*)
    val from = align(from0)
    val to = align(to0)
    to.exceptAll(from).withColumn("change_type", lit("insert"))
      .unionByName(from.exceptAll(to).withColumn("change_type", lit("delete")))
  }

  /** Drop versions below `keepFrom` and delete batch directories no
    * surviving manifest references — the VACUUM half of the replace
    * commit's "old batches stay for history". Returns the deleted batch
    * directories. Time travel below `keepFrom` stops working; reads at
    * surviving versions are untouched (their file lists don't change).
    *
    * Also sweeps ORPHANED batch directories: data written by a writer
    * that died (or gave up) before publishing appears in NO manifest and
    * would otherwise leak forever (writer-unique names mean nothing ever
    * reclaims the path). Only orphans whose directory mtime is older
    * than `orphanGraceMs` go — a LIVE writer's in-flight batch is always
    * younger than the grace window (Delta VACUUM's retention-interval
    * contract, applied to staging data).
    */
  def vacuum(spark: SparkSession, dir: String, keepFrom: Int,
      orphanGraceMs: Long = 3600L * 1000): Seq[String] = {
    val f = fs(spark, dir)
    val all = versions(spark, dir)
    require(all.contains(keepFrom), s"keepFrom=$keepFrom not a version of $dir")
    val (drop, keep) = all.partition(_ < keepFrom)
    val referenced = keep.flatMap(entriesAt(spark, dir, _)).map(_.batch).toSet
    val dead = drop.flatMap(entriesAt(spark, dir, _)).map(_.batch).distinct
      .filterNot(referenced)
    dead.foreach(b => f.delete(new Path(s"$dir/$b"), true))
    drop.foreach(v => f.delete(manifestPath(dir, v), false))
    // orphan sweep: batch dirs referenced by NO surviving manifest (the
    // dropped manifests' own batches were just handled above, so at this
    // point `referenced` — the keep set — is the full live reference set)
    val dataDir = new Path(s"$dir/data")
    val orphans =
      if (!f.exists(dataDir)) Seq.empty
      else {
        val cutoff = System.currentTimeMillis() - orphanGraceMs
        f.listStatus(dataDir).toSeq
          .filter(s => s.isDirectory && s.getModificationTime < cutoff &&
            !referenced.contains(s"data/${s.getPath.getName}"))
          .map(_.getPath)
      }
    orphans.foreach(p => f.delete(p, true))
    dead ++ orphans.map(p => s"data/${p.getName}")
  }

  private def readManifestEntries(spark: SparkSession, dir: String, v: Int): Seq[String] = {
    val f = fs(spark, dir)
    val p = manifestPath(dir, v)
    require(f.exists(p), s"version $v not found at $dir")
    val in = f.open(p)
    val body = try scala.io.Source.fromInputStream(in, "UTF-8").mkString finally in.close()
    // manifest body: one data directory per line, optionally followed by
    // tab-separated column/min/max stats (JSON-free on purpose — no
    // parser dependency, trivially greppable)
    body.linesIterator.map(_.trim).filter(_.nonEmpty).toSeq
  }

  /** Atomic publish-if-absent: write the manifest body to a
    * writer-unique temp name, then move it to `vNNNNN.json` with
    * create-if-absent semantics. Returns false (manifest untouched) if
    * another writer already owns the version. A reader either sees the
    * complete manifest or no version at all.
    *
    *  - local fs: POSIX hard-link — link(2) is atomic and fails with
    *    EEXIST when the destination exists. Rename is NOT a lock here:
    *    RawLocalFileSystem renames via File.renameTo, which silently
    *    overwrites an existing destination (ADVICE r6).
    *  - other stores: Hadoop rename, which the HDFS contract defines as
    *    failing when the destination exists. (S3-style stores without
    *    atomic create-if-absent degrade to best-effort — documented.)
    */
  private def publishIfAbsent(f: FileSystem, dir: String, v: Int,
      nonce: String, batches: Seq[String]): Boolean = {
    f.mkdirs(manifestDir(dir))
    val dest = manifestPath(dir, v)
    if (f.exists(dest)) return false
    val tmp = new Path(manifestDir(dir), f".v$v%05d-$nonce.tmp")
    val out = f.create(tmp, true)
    try out.write((batches.mkString("\n") + "\n").getBytes("UTF-8")) finally out.close()
    val won =
      if (isLocal(f)) {
        val destNio = java.nio.file.Paths.get(dest.toUri.getPath)
        val tmpNio = java.nio.file.Paths.get(tmp.toUri.getPath)
        try { java.nio.file.Files.createLink(destNio, tmpNio); true }
        catch {
          case _: java.nio.file.FileAlreadyExistsException => false
          // our tmp vanished: a concurrent winner's dead-tmp sweep (or an
          // admin cleanup) raced us — treat exactly like a lost publish
          // and let the caller rebase + retry with a fresh tmp
          case _: java.nio.file.NoSuchFileException => false
        }
      } else f.rename(tmp, dest)
    if (f.exists(tmp)) f.delete(tmp, false)
    if (won) sweepDeadTmps(f, dir, v)
    won
  }

  private def isLocal(f: FileSystem): Boolean = f match {
    case _: org.apache.hadoop.fs.LocalFileSystem => true
    case _: org.apache.hadoop.fs.RawLocalFileSystem => true
    case _ => false
  }

  /** Delete leftover `.vNNNNN-*.tmp` files for versions STRICTLY below
    * the one just published — those are provably dead (their writer
    * either won long ago and failed to clean up, or lost and crashed
    * before its own cleanup). Same-version tmps are left alone: a LIVE
    * loser of the race we just won may be between its tmp write and its
    * link attempt, and deleting under it would turn its clean lost-race
    * retry into a NoSuchFileException (handled, but noisy). Best-effort,
    * runs once per successful commit.
    */
  private def sweepDeadTmps(f: FileSystem, dir: String, upto: Int): Unit =
    try {
      f.listStatus(manifestDir(dir)).foreach { s =>
        val n = s.getPath.getName
        if (n.startsWith(".v") && n.endsWith(".tmp")) {
          val ver = n.stripPrefix(".v").takeWhile(_.isDigit)
          if (ver.nonEmpty && ver.toInt < upto) f.delete(s.getPath, false)
        }
      }
    } catch { case _: java.io.IOException => () }
}
