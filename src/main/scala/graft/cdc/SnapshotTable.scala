package graft.cdc

import java.nio.file.{Files, Path, Paths, StandardCopyOption}
import java.nio.charset.StandardCharsets
import scala.jdk.CollectionConverters._

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Snapshot-based lake table ("mini-Iceberg" — no Iceberg jar ships in
  * /opt/spark/jars, so the manifest/snapshot layer is implemented directly;
  * SURVEY.md §4.3). Layout:
  *
  * {{{
  * root/
  *   _current                 -- text file holding the live manifest version
  *   manifests/v<version>.json
  *   data/v<version>/_bucket=<b>/part-*.parquet   -- immutable once committed
  * }}}
  *
  * Commit protocol: write all data files and the manifest for version v+1,
  * then atomically swap `_current` (write `_current.tmp`, ATOMIC_MOVE over
  * `_current`). Readers resolve `_current` → manifest → file list, so they
  * only ever observe whole, committed snapshots — the linearization point
  * is the single rename, mirroring the reference's implicit reliance on
  * Snowflake's atomic MERGE (fct_trips.sql:1-13). Concurrent writers are
  * arbitrated by the lease-gated claim below (losers rebase via
  * [[MergeEngine]]); replayed/racing writers on the same lane are fenced
  * by (queryId, epochId) in [[Manifest.fences]].
  *
  * Scale note: a snapshot is O(files) metadata on the driver; data stays in
  * executors. Bucket count sizes the rewrite granularity — at 100 TB you
  * run thousands of buckets so a MERGE touches only the buckets its keys
  * hash to; locally we default to 16.
  */
class SnapshotTable(val root: String, val defaultNumBuckets: Int = 16,
    val orphanClaimTtlMs: Long = SnapshotTable.DefaultOrphanClaimTtlMs,
    val manifestCheckpointEvery: Int = SnapshotTable.DefaultCheckpointEvery) {
  private val rootPath: Path = Paths.get(root)

  /** Published versions are immutable — resolved manifests memoize here
    * (bounded: entries are dropped once far behind the current version by
    * [[expireSnapshots]]' natural file deletion; a handle is also
    * short-lived relative to a table).
    */
  private val resolvedCache = new java.util.concurrent.ConcurrentHashMap[Long, Manifest]()

  /** Lease identity of this table handle as a writer: stamped into every
    * manifest this handle commits, so a claim conflict can tell "my own
    * earlier claim" from a foreign one.
    */
  val writerId: String = java.util.UUID.randomUUID().toString
  private def currentPtr: Path = rootPath.resolve("_current")
  private def manifestPath(v: Long): Path = rootPath.resolve(s"manifests/v$v.json")
  def dataDir(v: Long): Path = rootPath.resolve(s"data/v$v")

  /** Unique output dir for a write targeting version `v`. The suffix is
    * what makes LIVE concurrent writers possible: both racers write
    * side-by-side instead of clobbering each other's `data/v{N+1}` (an
    * overwrite-mode Spark write DELETES the target dir first), and the
    * loser's rebase re-points its already-written files at a higher
    * version. GC still recognizes the numeric version prefix.
    */
  def newDataDir(v: Long): Path =
    rootPath.resolve(s"data/v$v-${java.util.UUID.randomUUID.toString.take(8)}")

  def exists: Boolean = Files.exists(currentPtr)

  def currentVersion: Option[Long] =
    if (!exists) None
    else Some(new String(Files.readAllBytes(currentPtr), StandardCharsets.UTF_8).trim.toLong)

  def manifest: Option[Manifest] = currentVersion.map(manifestAt)

  /** Load a specific historical manifest version (time travel). Delta
    * manifests (the O(epoch) commit form) resolve their file lists
    * through the parent chain, bounded by the checkpoint cadence and
    * memoized per published version.
    */
  def manifestAt(v: Long): Manifest = {
    require(Files.exists(manifestPath(v)), s"no snapshot v$v at $root (expired or never committed)")
    resolveVersion(v, manifestPath(v))
  }

  /** Chain-kept manifest location for versions whose snapshot expired but
    * whose delta chain is still needed to resolve a retained child.
    */
  private def chainPath(v: Long): Path = rootPath.resolve(s"manifests/chain/v$v.json")

  /** Count of cache-miss full manifest resolutions by this handle —
    * observability for the change-feed walk's "no per-version resolution
    * on deep catch-up" contract (asserted in ChangeFeedSpec).
    */
  private[cdc] val fullResolutions = new java.util.concurrent.atomic.AtomicLong(0)

  private def resolveVersion(v: Long, at: Path): Manifest = {
    val cached = resolvedCache.get(v)
    if (cached != null) return cached
    fullResolutions.incrementAndGet()
    val m = Manifest.resolve(
      new String(Files.readAllBytes(at), StandardCharsets.UTF_8),
      parent => resolveVersion(parent,
        if (Files.exists(manifestPath(parent))) manifestPath(parent)
        else {
          require(Files.exists(chainPath(parent)),
            s"broken manifest chain at $root: v$v needs v$parent, which is gone")
          chainPath(parent)
        }))
    // only PUBLISHED versions are immutable (an unpublished claim at
    // v > current can be replaced by an orphan reclaim)
    if (currentVersion.exists(_ >= v)) resolvedCache.put(v, m)
    m
  }

  /** File-level changes of every commit in (fromV, toV], NEWEST FIRST:
    * (version, filesAdded, removedPaths). O(window's epoch files) driver
    * work: delta manifests and step-annotated checkpoints carry their own
    * step diff, so no intermediate manifest is resolved to its full file
    * list — a consumer catching up over a deep window (10^4 versions of
    * lag on a 10^5-file table) no longer pays O(lag × table files) set
    * diffs. For wide windows the manifest bytes are fetched with ONE
    * directory listing + parallel reads instead of per-version sequential
    * stat+read round trips. Versions lacking step info (pre-annotation
    * checkpoints, defensive full writes) fall back to a resolved diff
    * against their parent — the annotation is an optimization, never a
    * correctness dependency.
    */
  def changesBetween(fromV: Long, toV: Long): Seq[(Long, Seq[FileEntry], Seq[String])] = {
    require(fromV <= toV, s"bad change window v$fromV..v$toV at $root")
    val prefetched = new java.util.concurrent.ConcurrentHashMap[Long, String]()
    if (toV - fromV > 8) {
      import scala.jdk.CollectionConverters._
      val dirStream = Files.list(rootPath.resolve("manifests"))
      val wanted =
        try dirStream.iterator().asScala.flatMap { p =>
          val n = p.getFileName.toString
          if (n.startsWith("v") && n.endsWith(".json"))
            scala.util.Try(n.stripPrefix("v").stripSuffix(".json").toLong).toOption
              .filter(v => v > fromV && v <= toV).map(v => (v, p))
          else None
        }.toVector
        finally dirStream.close()
      if (wanted.nonEmpty) {
        val pool = java.util.concurrent.Executors.newFixedThreadPool(math.min(16, wanted.size))
        try {
          wanted.map { case (v, p) =>
            pool.submit(new java.util.concurrent.Callable[Unit] {
              def call(): Unit = {
                prefetched.put(v, new String(Files.readAllBytes(p), StandardCharsets.UTF_8)); ()
              }
            })
          }.foreach(_.get())
        } finally pool.shutdown()
      }
    }
    def pathOf(v: Long): Path =
      if (Files.exists(manifestPath(v))) manifestPath(v)
      else {
        require(Files.exists(chainPath(v)),
          s"no snapshot v$v at $root (expired or never committed)")
        chainPath(v)
      }
    def rawOf(v: Long): String = {
      val c = prefetched.get(v)
      if (c != null) c
      else new String(Files.readAllBytes(pathOf(v)), StandardCharsets.UTF_8)
    }
    val out = Vector.newBuilder[(Long, Seq[FileEntry], Seq[String])]
    var v = toV
    while (v > fromV) {
      Manifest.stepChangesOf(rawOf(v)) match {
        case Some((pv, added, removed)) =>
          out += ((v, added, removed)); v = pv
        case None =>
          val child = resolveVersion(v, pathOf(v))
          val parent = resolveVersion(child.parentVersion, pathOf(child.parentVersion))
          val parentPaths = parent.files.map(_.path).toSet
          val childPaths = child.files.map(_.path).toSet
          out += ((v, child.files.filterNot(f => parentPaths.contains(f.path)),
            parent.files.map(_.path).filterNot(childPaths.contains)))
          v = child.parentVersion
      }
    }
    out.result()
  }

  def schema: Option[StructType] =
    manifest.map(m => DataType.fromJson(m.currentSchemaJson).asInstanceOf[StructType])

  /** Create an empty table at version 0 with the given user schema. */
  def init(schema: StructType, numBuckets: Int = defaultNumBuckets): Manifest = {
    require(!exists, s"table already exists at $root")
    Files.createDirectories(rootPath.resolve("manifests"))
    Files.createDirectories(rootPath.resolve("data"))
    val m = Manifest(
      version = 0L, parentVersion = -1L, numBuckets = numBuckets,
      schemas = Seq(schema.json), files = Seq.empty,
      fences = Map.empty, watermarks = Map.empty, metrics = Seq.empty)
    commit(m)
    m
  }

  /** Initialize from a change-event schema if the table does not exist
    * yet — the shared init-on-first-write path of IngestJob, the batch
    * writer and the streaming sink.
    */
  def ensureInitialized(eventSchema: StructType): Unit =
    if (!exists) init(Model.payloadSchema(eventSchema), defaultNumBuckets)

  /** Atomically publish a new manifest version, with optimistic
    * concurrency (the round-2 "silent lost update" fix):
    *
    *  - The version's manifest file is CLAIMED with an atomic hard link
    *    (link(2) fails with EEXIST; POSIX rename(2) would silently
    *    replace). Committing a version at or below the PUBLISHED
    *    current throws [[SnapshotTable.ConcurrentCommitException]] — the
    *    loser must re-read the table and rebase its merge (MergeEngine's
    *    pre-commit `latest.version` require is the cheap early check;
    *    this is the race-free arbiter for completed commits).
    *  - An EXISTING but UNPUBLISHED claim (manifest file present, pointer
    *    still behind) is reclaimed only from a provably-not-live
    *    claimant: either the claim carries THIS handle's [[writerId]]
    *    (our own earlier attempt — the fenced resume path), or it is
    *    older than [[orphanClaimTtlMs]] (a writer that died between
    *    claim and publish; a live writer publishes within moments of
    *    claiming). A FRESH foreign claim means a live concurrent writer
    *    is mid-publish — the commit fails with
    *    [[SnapshotTable.ConcurrentCommitException]] instead of silently
    *    replacing it (both "winning" was the round-3 advisory). A
    *    crashed writer therefore blocks the version for at most the TTL;
    *    epoch fences make the post-TTL re-commit equivalent.
    *  - The current pointer only ever advances — verified AFTER the
    *    swap, not just checked before it, so a regression can never go
    *    unnoticed.
    */
  def commit(m0: Manifest): Unit = this.synchronized {
    // The claim→publish section is serialized PER HANDLE: writerId
    // identifies the handle, so two threads sharing one handle would
    // otherwise each read a foreign claim as "our own earlier attempt"
    // and silently replace the sibling's mid-publish manifest (both
    // reporting success, one writer's files lost — the round-3 advisory's
    // lost-update, resurfacing through the shared-handle path; caught as
    // a 1-in-N MultiWriterSpec flake under full-suite load). Distinct
    // handles and distinct processes still arbitrate via the atomic
    // hard-link lease; this lock only covers the one identity the lease
    // cannot tell apart from itself.
    val m = m0.copy(writerId = writerId)
    val mp = manifestPath(m.version)
    Files.createDirectories(mp.getParent)
    if (currentVersion.exists(_ >= m.version))
      throw new SnapshotTable.ConcurrentCommitException(root, m.version)
    val mtmp = rootPath.resolve(s"_manifest.tmp.${m.version}.${java.util.UUID.randomUUID}")
    // Delta-encode the file list against the parent except at checkpoint
    // versions (every `manifestCheckpointEvery`th) — per-epoch metadata
    // is O(epoch files), not O(table files); readers resolve through the
    // memoized chain, bounded by the cadence. Any doubt (initial commit,
    // unloadable parent, carried-entry mismatch) falls back to a full
    // checkpoint: the delta form is an optimization, never a correctness
    // dependency.
    val json =
      if (m.parentVersion < 0) Manifest.toJson(m)
      else if (m.version % manifestCheckpointEvery == 0)
        // checkpoints stay full (chain resolution bound) but carry their
        // own step diff so change-feed walks never resolve them
        Manifest.toJsonCheckpoint(m, scala.util.Try(manifestAt(m.parentVersion)).toOption)
      else scala.util.Try(manifestAt(m.parentVersion)).toOption
        .flatMap(p => Manifest.toJsonDelta(m, p))
        .getOrElse(Manifest.toJson(m))
    Files.write(mtmp, json.getBytes(StandardCharsets.UTF_8))
    // The CLAIM must be atomic-no-replace WITH full content: POSIX
    // rename(2) silently replaces an existing target (so ATOMIC_MOVE
    // cannot arbitrate), and CREATE_NEW writes content non-atomically. A
    // hard link is both: link(2) fails with EEXIST if the target exists,
    // and on success the fully-written manifest appears in one syscall.
    var reclaimed = false
    try { Files.createLink(mp, mtmp); Files.delete(mtmp) }
    catch {
      case _: java.nio.file.FileAlreadyExistsException =>
        if (currentVersion.exists(_ >= m.version)) { // published meanwhile
          Files.deleteIfExists(mtmp)
          throw new SnapshotTable.ConcurrentCommitException(root, m.version)
        }
        val claimant = scala.util.Try(Manifest.writerIdOf(
          new String(Files.readAllBytes(mp), StandardCharsets.UTF_8))).getOrElse("")
        val ageMs = scala.util.Try(
          System.currentTimeMillis - Files.getLastModifiedTime(mp).toMillis).getOrElse(Long.MaxValue)
        val resumable = (claimant.nonEmpty && claimant == writerId) || ageMs >= orphanClaimTtlMs
        if (!resumable) {
          Files.deleteIfExists(mtmp)
          throw new SnapshotTable.ConcurrentCommitException(root, m.version,
            s" (an unpublished claim by writer '$claimant' is only ${ageMs}ms old — " +
              s"a live writer may be mid-publish; reclaim opens after ${orphanClaimTtlMs}ms)")
        }
        // Post-TTL reclaim is NOT exclusive by construction (two handles
        // can both observe the same expired claim and both pass the age
        // gate — the round-4 advisory's lost update), so arbitrate it with
        // a second EEXIST-atomic lease before replacing anything. The
        // lease is HELD across the pointer publish and released only after
        // the post-publish verification below — releasing it at the move
        // would let a contender slip between our publish and our verify
        // and hand both racers a "success".
        reclaimOrphanClaim(m, mp, mtmp)
        reclaimed = true
    }
    try {
      if (currentVersion.forall(_ < m.version)) {
        val tmp = rootPath.resolve(s"_current.tmp.${m.version}")
        Files.write(tmp, m.version.toString.getBytes(StandardCharsets.UTF_8))
        Files.move(tmp, currentPtr, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
        // Post-swap verification: the claim serializes writers per version
        // and versions are linear, so the pointer we observe now must be at
        // or beyond what we just published. Anything else is a protocol
        // violation (e.g. an out-of-band rollback racing this commit) that
        // must surface, not silently lose this commit.
        val observed = currentVersion
        require(observed.exists(_ >= m.version),
          s"current pointer regressed at $root: observed $observed after publishing v${m.version}")
      }
      if (reclaimed) {
        // Final arbiter on the (REPLACE_EXISTING) reclaim path: the manifest
        // the world can now see must be OURS. If a concurrent reclaimer slid
        // past every earlier gate and its move landed last, this handle must
        // LOSE (rebase) rather than report a success whose files the
        // surviving manifest does not reference.
        val winner = scala.util.Try(Manifest.writerIdOf(
          new String(Files.readAllBytes(mp), StandardCharsets.UTF_8))).getOrElse("")
        if (winner != writerId)
          throw new SnapshotTable.ConcurrentCommitException(root, m.version,
            s" (post-publish verification: v${m.version} carries writer '$winner', " +
              "not this handle — a concurrent orphan reclaim won; rebase)")
      }
    } finally if (reclaimed) releaseReclaimLease(m.version)
  }

  /** Arbitrated replacement of an expired (post-TTL) orphan claim. The
    * contenders race on a SECOND hard-link lease (`_reclaim.v{N}`): the
    * link winner alone may overwrite the orphan manifest; losers throw and
    * rebase. A reclaimer that dies holding the lease parks the version for
    * one more TTL, after which the lease itself is reclaimed the same way.
    * Belt-and-braces ordering for the delete→relink window: after linking,
    * re-read the lease and require our own writerId (a racer interleaving
    * delete-then-link can otherwise end with two "holders"); and re-check
    * the published pointer immediately before the move so a version
    * published mid-race is never clobbered. On success the lease stays
    * HELD — [[commit]] releases it via [[releaseReclaimLease]] only after
    * its post-publish writerId verification, the final arbiter.
    */
  private def reclaimOrphanClaim(m: Manifest, mp: Path, mtmp: Path): Unit = {
    val lease = rootPath.resolve(s"_reclaim.v${m.version}")
    val ltmp = rootPath.resolve(s"_reclaim.tmp.${m.version}.${java.util.UUID.randomUUID}")
    Files.write(ltmp, writerId.getBytes(StandardCharsets.UTF_8))
    def lose(detail: String): Nothing = {
      Files.deleteIfExists(mtmp); Files.deleteIfExists(ltmp)
      throw new SnapshotTable.ConcurrentCommitException(root, m.version, detail)
    }
    try {
      try Files.createLink(lease, ltmp)
      catch {
        case _: java.nio.file.FileAlreadyExistsException =>
          val leaseAge = scala.util.Try(
            System.currentTimeMillis - Files.getLastModifiedTime(lease).toMillis)
            .getOrElse(Long.MaxValue)
          if (leaseAge < orphanClaimTtlMs)
            lose(s" (another writer holds the v${m.version} reclaim lease, " +
              s"${leaseAge}ms old — it is mid-reclaim; rebase)")
          Files.deleteIfExists(lease)
          try Files.createLink(lease, ltmp)
          catch { case _: java.nio.file.FileAlreadyExistsException =>
            lose(s" (lost the v${m.version} reclaim-lease race; rebase)")
          }
      }
      val holder = scala.util.Try(
        new String(Files.readAllBytes(lease), StandardCharsets.UTF_8)).getOrElse("")
      if (holder != writerId)
        lose(s" (reclaim lease for v${m.version} held by '$holder'; rebase)")
      if (currentVersion.exists(_ >= m.version)) {
        releaseReclaimLease(m.version)
        lose("") // published while we arbitrated — never clobber it
      }
      Files.move(mtmp, mp, StandardCopyOption.ATOMIC_MOVE, StandardCopyOption.REPLACE_EXISTING)
    } finally Files.deleteIfExists(ltmp)
  }

  /** Release our own `_reclaim.v{N}` lease (never a contender's: a
    * TTL-expired lease may have been taken over while we still think we
    * hold it, so the content is checked before the delete).
    */
  private def releaseReclaimLease(version: Long): Unit = {
    val lease = rootPath.resolve(s"_reclaim.v$version")
    if (scala.util.Try(new String(Files.readAllBytes(lease), StandardCharsets.UTF_8))
        .toOption.contains(writerId))
      Files.deleteIfExists(lease)
  }

  /** Cast/pad `df` to exactly `target` (case-insensitive name resolution,
    * missing columns null-filled, Integer→Long / Float→Double widening via
    * cast) — the engine's MATCH_BY_COLUMN_NAME + ENABLE_SCHEMA_EVOLUTION
    * analog (reference snowflake/setup.sql:58-61).
    */
  def conformTo(df: DataFrame, target: StructType): DataFrame =
    df.select(SnapshotTable.conformColumns(df.schema, target): _*)

  /** Read the given file entries as uniform change rows: payload columns
    * (conformed to the current schema) + `lsn` + `op`. Base files surface
    * op='K' (already reconciled); delta files surface their stored `_op`
    * including delete tombstones. Files are grouped by their written
    * schemaId so a physical int32 column widened to long is cast, never
    * mis-read.
    */
  private[cdc] def readEntries(spark: SparkSession, m: Manifest, entries: Seq[FileEntry]): DataFrame = {
    val payload = DataType.fromJson(m.currentSchemaJson).asInstanceOf[StructType]
    val target = StructType(payload.fields)
      .add("lsn", LongType, nullable = false)
      .add("op", StringType, nullable = false)
    if (entries.isEmpty) {
      spark.createDataFrame(spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], target)
    } else {
      entries.groupBy(f => (f.schemaId, f.isDelta)).toSeq.sortBy(g => (g._1._1, g._1._2)).map {
        case ((sid, isDelta), fs) =>
          val base = DataType.fromJson(m.schemas(sid)).asInstanceOf[StructType]
            .add(Model.LsnCol, LongType, nullable = false)
          val written = if (isDelta) base.add(Model.OpCol, StringType, nullable = false) else base
          val df = spark.read.schema(written).parquet(fs.map(_.path): _*)
          val opCol = if (isDelta) col(Model.OpCol) else lit(Model.OpKeep)
          df.select(SnapshotTable.conformColumns(df.schema, payload) ++
            Seq(col(Model.LsnCol).as("lsn"), opCol.as("op")): _*)
      }.reduce(_.unionByName(_))
    }
  }

  /** Current snapshot as a DataFrame of payload columns. Base-only
    * snapshots read the files directly; snapshots with merge-on-read
    * deltas reconcile (last-LSN-wins, tombstones drop rows) on the fly —
    * but ONLY the buckets some delta range covers: clean buckets' base
    * files stream through with no shuffle (O(dirty buckets) read
    * overhead, not O(table)).
    */
  def read(spark: SparkSession): DataFrame = readWithLsn(spark).drop(Model.LsnCol)

  def readWithLsn(spark: SparkSession): DataFrame = {
    val m = manifest.getOrElse(sys.error(s"no such table: $root"))
    readResolved(spark, m, m.files)
  }

  /** Time travel: the table as of snapshot `v`, under THAT version's
    * schema (a column added later does not appear; rows merged later are
    * absent). Old data files are immutable, so this is a pure metadata
    * operation — no copy-on-read.
    */
  def readVersion(spark: SparkSession, v: Long): DataFrame =
    readVersionWithLsn(spark, v).drop(Model.LsnCol)

  def readVersionWithLsn(spark: SparkSession, v: Long): DataFrame = {
    val m = manifestAt(v)
    readResolved(spark, m, m.files)
  }

  /** Retire all snapshots older than the last `keepLast` versions: their
    * manifests are deleted and any data file no retained manifest
    * references is removed. Time travel to an expired version then fails
    * fast with "expired"; the live read is untouched (current files are
    * always retained). Returns (manifests deleted, data files deleted).
    *
    * Crash ordering: expired MANIFESTS delete first — a crash mid-run then
    * leaves only orphaned data files (reclaimed by the next expire), never
    * a live manifest referencing deleted data. Data dirs numbered above
    * `_current` are skipped entirely: they belong to an in-flight writer's
    * not-yet-committed version (GC must not turn a racing commit into data
    * loss). With LIVE concurrent writers a rebasing loser's dir can carry
    * a numeric prefix at or below `_current` while its commit is still in
    * flight — so `minAgeMs` DEFAULTS to the claim TTL (no in-flight commit
    * outlives an unpublished claim by more than the TTL): GC only deletes
    * unreferenced files older than that window. Single-writer maintenance
    * (no concurrent committers possible) may pass 0 explicitly for
    * immediate reclamation.
    */
  def expireSnapshots(keepLast: Int = 1, minAgeMs: Long = orphanClaimTtlMs): (Int, Int) = {
    val cutoff = System.currentTimeMillis - minAgeMs
    require(keepLast >= 1, "must retain at least the current snapshot")
    val cur = currentVersion.getOrElse(sys.error(s"no such table: $root"))
    val all = graft.util.Tables.listClosed(rootPath.resolve("manifests"))(
      _.map(_.getFileName.toString).filter(_.startsWith("v"))
        .map(_.stripPrefix("v").stripSuffix(".json").toLong).toSeq).sorted
    val retained = all.filter(v => v > cur - keepLast && v <= cur)
    val expired = all.filterNot(retained.contains)
    // resolve BEFORE touching any manifest file (delta chains read parents)
    val keepFiles = retained.map(manifestAt).flatMap(_.files.map(_.path)).toSet
    // A retained DELTA manifest resolves through its parent chain up to
    // the nearest checkpoint; those chain manifests must outlive their
    // own snapshots' expiry (bounded: < manifestCheckpointEvery files).
    // They move to manifests/chain/ — out of the version listing, so an
    // expired-but-chain-kept version still fails time travel fast — and
    // are GC'd here once no retained manifest references them. Their DATA
    // files get no such retention: keepFiles comes from retained states
    // only.
    def chainOf(v: Long): List[Long] = {
      val p = if (Files.exists(manifestPath(v))) manifestPath(v) else chainPath(v)
      if (!Files.exists(p)) Nil
      else Manifest.parentRefOf(new String(Files.readAllBytes(p), StandardCharsets.UTF_8)) match {
        case Some(parent) => parent :: chainOf(parent)
        case None => Nil
      }
    }
    val chainNeeded: Set[Long] = retained.flatMap(chainOf).toSet -- retained
    if (chainNeeded.nonEmpty) Files.createDirectories(chainPath(0L).getParent)
    expired.foreach { v =>
      if (chainNeeded.contains(v)) {
        if (!Files.exists(chainPath(v)))
          Files.move(manifestPath(v), chainPath(v), StandardCopyOption.ATOMIC_MOVE)
        else Files.deleteIfExists(manifestPath(v))
      } else Files.deleteIfExists(manifestPath(v))
    }
    // stale chain files (no retained manifest resolves through them)
    if (Files.exists(chainPath(0L).getParent)) {
      graft.util.Tables.listClosed(chainPath(0L).getParent)(
        _.map(_.getFileName.toString).filter(_.startsWith("v"))
          .map(_.stripPrefix("v").stripSuffix(".json").toLong).toSeq)
        .filterNot(chainNeeded.contains)
        .foreach(v => Files.deleteIfExists(chainPath(v)))
    }
    var dataDeleted = 0
    val dataRoot = rootPath.resolve("data")
    if (Files.exists(dataRoot)) {
      val committedDirs = graft.util.Tables.listClosed(dataRoot)(
        _.filter(Files.isDirectory(_)).toSeq).filter { d =>
          // numeric version PREFIX: write dirs are either "v12" (legacy)
          // or "v12-ab34cd5e" (unique per write attempt, multi-writer)
          val nm = d.getFileName.toString
          val num = nm.stripPrefix("v").takeWhile(_.isDigit)
          nm.startsWith("v") && num.nonEmpty &&
            scala.util.Try(num.toLong).toOption.exists(_ <= cur)
        }
      committedDirs.foreach { vd =>
        graft.util.Tables.walkClosed(vd)(_.toSeq).reverse.foreach { p =>
          if (Files.isRegularFile(p) && p.getFileName.toString.startsWith("part-") &&
              !keepFiles.contains(p.toString) &&
              scala.util.Try(Files.getLastModifiedTime(p).toMillis <= cutoff).getOrElse(true)) {
            Files.delete(p); dataDeleted += 1
          } else if (Files.isDirectory(p) &&
              graft.util.Tables.listClosed(p)(!_.hasNext)) {
            Files.delete(p)
          }
        }
      }
    }
    (expired.size, dataDeleted)
  }

  /** Reconcile-if-needed read of a file subset: dirty buckets (covered by
    * some delta in the subset) go through [[Reconcile]]; the rest are
    * plain scans.
    */
  private[cdc] def readResolved(spark: SparkSession, m: Manifest, entries: Seq[FileEntry]): DataFrame = {
    val payloadNames = DataType.fromJson(m.currentSchemaJson).asInstanceOf[StructType].fieldNames.toSeq
    val outCols = payloadNames.map(col) ++ Seq(col("lsn").as(Model.LsnCol))
    val deltas = entries.filter(_.isDelta)
    if (deltas.isEmpty) return readEntries(spark, m, entries).select(outCols: _*)

    val dirty: Set[Int] = deltas.flatMap(_.coveredBuckets(m.numBuckets)).toSet
    val (dirtyFiles, cleanFiles) =
      entries.partition(f => f.isDelta || dirty.contains(f.bucket))
    val reconciled = Reconcile
      .winners(spark, readEntries(spark, m, dirtyFiles), m.numBuckets, writeSplits = 4,
        rowsHint = rowsOf(dirtyFiles))
      .select(outCols: _*)
    if (cleanFiles.isEmpty) reconciled
    else reconciled.unionByName(readEntries(spark, m, cleanFiles).select(outCols: _*))
  }

  /** Manifest-pruned read: only files whose bucket (base) or bucket range
    * (delta) covers one of `buckets`, further skipped by `minLsn` (a file
    * whose maxLsn < minLsn cannot hold a row that survives the filter).
    * Returns current winners of those buckets with `_lsn >= minLsn` —
    * the "changed since LSN X in these key ranges" incremental-consumer
    * read. Post-filters make pruning safe: a winner pruned away must have
    * lsn < minLsn (its file would otherwise have maxLsn >= minLsn), and
    * stale lower-LSN rows that outlive their winner's file are dropped by
    * the final `_lsn >= minLsn` predicate.
    */
  def readBuckets(spark: SparkSession, buckets: Set[Int],
      minLsn: Long = Long.MinValue): DataFrame = {
    val m = manifest.getOrElse(sys.error(s"no such table: $root"))
    val selected = pruneEntries(m, buckets, minLsn)
    readResolved(spark, m, selected)
      .filter(SnapshotTable.bucketOf(col("doc_id"), m.numBuckets).isin(buckets.toSeq: _*))
      .filter(col(Model.LsnCol) >= minLsn)
  }

  /** Manifest-recorded row total of a file set for Reconcile's adaptive
    * partition count; None when any entry's footer stats were unreadable
    * (rows == -1) — the conservative over-provisioned count then applies.
    */
  private[cdc] def rowsOf(entries: Seq[FileEntry]): Option[Long] =
    if (entries.forall(_.rows >= 0)) Some(entries.map(_.rows).sum) else None

  /** The file-skipping core of [[readBuckets]], exposed for tests. */
  private[cdc] def pruneEntries(m: Manifest, buckets: Set[Int], minLsn: Long): Seq[FileEntry] =
    m.files.filter(f => buckets.exists(f.covers) && f.maxLsn >= minLsn)

  /** Point lookup: current rows of a BOUNDED key set (a serving-layer /
    * debugging / erasure-audit read, not a corpus scan), touching the
    * fewest files the manifest can prove sufficient:
    *
    *  1. bucket prune — only files covering some sought key's
    *     hash bucket;
    *  2. key-range prune — base files are written clustered (sorted by
    *     key within the bucket), so a file whose footer-derived
    *     [minKey, maxKey] excludes every sought key is skipped WITHOUT
    *     opening it (manifest-level, cheaper than parquet's own
    *     footer-stats skip; entries with unknown ranges are read
    *     conservatively);
    *  3. the `doc_id IN (...)` predicate is pushed into the parquet scan,
    *     so row groups inside surviving files still skip on their own
    *     stats.
    *
    * Merge-on-read deltas covering a sought bucket always participate
    * (they may hold a newer version or a tombstone of the key); the usual
    * last-LSN-wins reconcile runs over the (tiny) filtered row set. At
    * thousands of buckets × several clustered files each, a lookup reads
    * ~1 base file + the bucket's delta tail per key — O(keys), never
    * O(table).
    */
  def lookupKeys(spark: SparkSession, keys: Seq[String]): DataFrame =
    lookupKeysWithLsn(spark, keys).drop(Model.LsnCol)

  /** [[lookupKeys]] keeping the `_lsn` column — the shape the data-source
    * read paths substitute when a `doc_id =`/`IN` predicate is pushed.
    */
  private[graft] def lookupKeysWithLsn(spark: SparkSession, keys: Seq[String]): DataFrame = {
    require(keys.nonEmpty, "lookupKeys: empty key set")
    val m = manifest.getOrElse(sys.error(s"no such table: $root"))
    // tiny local job: bucket assignment must be exactly the engine's
    // (Spark's codegen'd xxhash64), not a JVM reimplementation
    import spark.implicits._
    val byBucket: Map[Int, Seq[String]] = keys.toDF(Model.KeyCol)
      .select(col(Model.KeyCol),
        SnapshotTable.bucketOf(col(Model.KeyCol), m.numBuckets).as("b"))
      .collect().map(r => (r.getString(0), r.getInt(1))).toSeq
      .groupBy(_._2).view.mapValues(_.map(_._1)).toMap
    val selected = pruneForKeys(m, byBucket)
    readResolved(spark, m, selected)
      .filter(col(Model.KeyCol).isin(keys: _*))
  }

  /** The file-skipping core of [[lookupKeys]], exposed for tests: a file
    * is read only if, for some bucket it covers, a key OF THAT BUCKET
    * falls inside the file's key range (checking a file against another
    * bucket's keys would re-read files the hash already rules out).
    */
  private[graft] def pruneForKeys(m: Manifest, keysByBucket: Map[Int, Seq[String]]): Seq[FileEntry] =
    m.files.filter(f => keysByBucket.exists {
      case (b, ks) => f.covers(b) && ks.exists(f.mayContainKey)
    })

  /** List part files of a flat (non-partitioned) output dir. */
  private[cdc] def listDataFiles(dir: Path): Seq[String] = {
    if (!Files.exists(dir)) return Seq.empty
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map(_.toString).toSeq.sorted
  }

  /** List the part files Spark wrote under a partitionBy("_bucket") output
    * dir, returning (absolutePath, bucket) pairs.
    */
  private[cdc] def listBucketFiles(dir: Path): Seq[(String, Int)] = {
    if (!Files.exists(dir)) return Seq.empty
    Files.walk(dir).iterator().asScala
      .filter(p => Files.isRegularFile(p))
      .filter(p => p.getFileName.toString.startsWith("part-"))
      .map { p =>
        val bucketDir = p.getParent.getFileName.toString
        require(bucketDir.startsWith("_bucket="), s"unexpected layout at $p")
        (p.toString, bucketDir.stripPrefix("_bucket=").toInt)
      }.toSeq.sortBy(_._1)
  }
}

object SnapshotTable {

  /** Default age an unpublished foreign claim must reach before it is
    * treated as a crash orphan and reclaimed. Claim→publish is a
    * two-file-write window, so a minute of silence is conclusive.
    */
  val DefaultOrphanClaimTtlMs: Long = 60000L

  /** Every Nth version writes a FULL (checkpoint) manifest; the versions
    * between delta-encode their file lists against the parent. Bounds
    * both the reader's resolution chain and how long an expired delta's
    * manifest must be chain-retained.
    */
  val DefaultCheckpointEvery: Int = 16

  /** Another writer committed this version first (optimistic-concurrency
    * loss): re-read the table and rebase the merge onto the new current.
    */
  final class ConcurrentCommitException(root: String, version: Long, detail: String = "")
    extends RuntimeException(
      s"concurrent commit lost at $root: v$version already exists — rebase onto the current manifest$detail")

  /** Projection list that casts/pads a source schema onto `target`:
    * case-insensitive resolution, missing columns null-filled, numeric
    * widening via cast.
    */
  def conformColumns(source: StructType, target: StructType): Seq[Column] = {
    val byLower = source.fields.map(f => f.name.toLowerCase -> f).toMap
    target.fields.toSeq.map { f =>
      byLower.get(f.name.toLowerCase) match {
        // parquet relations force array elements nullable on read; a cast
        // differing only in nullability is both unnecessary and rejected
        // by Catalyst (CAST_WITHOUT_SUGGESTION), so compare modulo nulls
        case Some(src) if sameIgnoreNullability(src.dataType, f.dataType) =>
          col(src.name).as(f.name)
        case Some(src) =>
          col(src.name).cast(relaxNulls(f.dataType)).as(f.name)
        case None => lit(null).cast(relaxNulls(f.dataType)).as(f.name)
      }
    }
  }

  /** Nullability-relaxed copy of a type (DataType.asNullable is
    * private[spark]).
    */
  def relaxNulls(dt: DataType): DataType = dt match {
    case ArrayType(e, _) => ArrayType(relaxNulls(e), containsNull = true)
    case MapType(k, v, _) => MapType(relaxNulls(k), relaxNulls(v), valueContainsNull = true)
    case StructType(fs) =>
      StructType(fs.map(f => f.copy(dataType = relaxNulls(f.dataType), nullable = true)))
    case x => x
  }

  def sameIgnoreNullability(a: DataType, b: DataType): Boolean = (a, b) match {
    case (ArrayType(x, _), ArrayType(y, _)) => sameIgnoreNullability(x, y)
    case (MapType(xk, xv, _), MapType(yk, yv, _)) =>
      sameIgnoreNullability(xk, yk) && sameIgnoreNullability(xv, yv)
    case (StructType(xs), StructType(ys)) =>
      xs.length == ys.length && xs.zip(ys).forall { case (f, g) =>
        f.name == g.name && sameIgnoreNullability(f.dataType, g.dataType)
      }
    case _ => a == b
  }

  /** Deterministic bucket of a doc_id. xxhash64 is Spark's codegen'd 64-bit
    * hash — stable across versions/partitionings.
    */
  def bucketOf(docId: Column, numBuckets: Int): Column =
    pmod(xxhash64(docId), lit(numBuckets.toLong)).cast("int")

  /** Additive, case-insensitive schema merge with safe numeric widening —
    * new columns append, Integer→Long and Float→Double widen; anything else
    * incompatible throws.
    */
  def mergeSchemas(table: StructType, batch: StructType): StructType = {
    def widen(a: DataType, b: DataType): DataType = (a, b) match {
      case (x, y) if x == y => x
      case (IntegerType, LongType) | (LongType, IntegerType) => LongType
      case (FloatType, DoubleType) | (DoubleType, FloatType) => DoubleType
      case (ArrayType(ea, n1), ArrayType(eb, n2)) => ArrayType(widen(ea, eb), n1 || n2)
      case _ => throw new IllegalArgumentException(
        s"incompatible schema evolution: $a vs $b")
    }
    val batchByLower = batch.fields.map(f => f.name.toLowerCase -> f).toMap
    val merged = table.fields.toSeq.map { f =>
      batchByLower.get(f.name.toLowerCase) match {
        case Some(bf) => StructField(f.name, widen(f.dataType, bf.dataType), f.nullable || bf.nullable)
        case None     => f
      }
    }
    val tableLower = table.fields.map(_.name.toLowerCase).toSet
    val added = batch.fields.toSeq
      .filterNot(f => tableLower.contains(f.name.toLowerCase))
      .map(f => f.copy(nullable = true)) // backfilled as null for old rows
    StructType(merged ++ added)
  }
}
