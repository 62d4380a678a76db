package graft.etl

import java.nio.charset.StandardCharsets
import java.util.UUID

import scala.concurrent.{Await, ExecutionContext, Future}
import scala.concurrent.duration.Duration

import org.apache.hadoop.fs.{FileSystem, Path => HPath}
import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._

/** Manifest-pointer committed tables: the object-store-safe form of the
  * reference's multi-table transaction (`main.py:173-195`, T1) that
  * [[IncrementalLoad.atomicPublish]] implements with directory renames.
  *
  * Rename-based swaps are atomic on HDFS but NOT on S3-like object
  * stores, where rename of a directory is per-object copy+delete and a
  * concurrent reader can observe a mid-swap tree. This module removes
  * renames of DATA from the commit path entirely:
  *
  *  - data files are immutable and uniquely named (`<table>/d-<uuid>/
  *    part-*.parquet`) — they are never renamed, overwritten, or deleted
  *    by a commit, only by an explicit [[vacuum]];
  *  - a version is one small COMMIT FILE (`_commits/c-<seq>.txt`): a
  *    full snapshot for the first version, a DELTA (removed keys +
  *    upserted entries, batch-proportional) afterwards, with periodic
  *    `k-<seq>.txt` checkpoint snapshots amortizing resolution; entries
  *    carry per-file canonical min/max stats, row counts, byte sizes
  *    and content-addressed Bloom-sidecar pointers for file skipping;
  *  - readers resolve the highest committed sequence number and the
  *    entry list it implies — so a commit "happens" at the instant
  *    one small object appears, which is atomic even where directory
  *    rename is not (an object-store PUT, or the copy half of its
  *    rename, materializes the whole object or nothing).
  *
  * Consequences, each spec'd in EtlInvariantsSpec / ManifestTableSpec:
  *  - CRASH-SAFE PUBLISH: a failure anywhere before the commit file
  *    lands leaves only orphan data files; the previous version keeps
  *    serving reads untouched (the reference's rollback semantics with
  *    zero restore work).
  *  - SNAPSHOT ISOLATION: a reader that resolved version N keeps a
  *    consistent file list even while version N+1 commits (old files
  *    are immortal until vacuum).
  *  - TIME TRAVEL: any retained version can be read back ([[readAt]]).
  *  - MULTI-TABLE ATOMICITY: one commit file carries every table, so a
  *    multi-table publish is all-or-nothing BY CONSTRUCTION — there is
  *    no per-table swap loop to crash in the middle of.
  *
  * This is the mechanism Iceberg/Delta/Hudi build on (a metadata pointer
  * over immutable files), self-contained here over the public Hadoop
  * FileSystem + parquet APIs — same pattern as [[DataLayout]]'s
  * `_manifest` min/max index, promoted from statistics to the source of
  * truth for table contents.
  *
  * Scale notes: commit files are CHANGED-file-sized (deltas), resolved
  * on the driver at plan time from the nearest checkpoint/cached state
  * — the same cost class as Spark's own file-index listing, without the
  * eventual-consistency hazards of LIST-after-PUT (the commit chain
  * names its files; nothing is discovered by listing data dirs). Concurrent committers race on
  * the next sequence number optimistically: the commit file name is
  * EXACTLY `c-<seq>.txt`, so the loser's rename fails on
  * destination-exists (`FileContext.rename` with `Options.Rename.NONE`
  * — exclusion guaranteed by the Hadoop FS spec, not by any one
  * implementation) and its caller re-resolves [[current]] and retries.
  * ALL writers to a root must be on this fixed-name protocol — the
  * legacy `c-<seq>-<uuid>.txt` form is READ-compatible only, a legacy
  * writer is not excluded by the fixed-name rename. On true
  * object stores, where rename is copy+delete without an exclusivity
  * guarantee, concurrent committers additionally need a CAS/lock
  * service (the same qualification Delta Lake documents for S3) or a
  * single-writer-per-root deployment; single-writer needs nothing.
  */
object ManifestTable {

  private val CommitDir = "_commits"
  // fixed per-sequence name (`c-<seq>.txt`) is the commit-exclusion
  // mechanism; the uuid-suffixed form is accepted for roots written
  // before the fixed-name protocol. ALL WRITERS TO A ROOT MUST BE ON THE
  // FIXED-NAME PROTOCOL: legacy uuid names are read-compatible only — a
  // legacy writer racing a fixed-name writer on the same sequence is not
  // excluded (different destinations), and the hint fast path probes
  // fixed names only.
  private val CommitName = """c-(\d{20})(?:-[0-9a-f]{32})?\.txt""".r
  private def fixedName(seq: Long): String = f"c-$seq%020d.txt"
  /** Latest-version pointer (`_commits/_latest.hint`), updated
    * best-effort after every commit — Delta's `_last_checkpoint` idea.
    * Resolution cost without it is a full `_commits` LIST (grows with
    * retained versions — a long-lived CDC sink accumulates thousands);
    * with it, resolve is one small GET plus exists-probes forward from
    * the hinted sequence (0 probes when fresh, k when k commits raced
    * past the hint write). The hint is NEVER load-bearing: missing,
    * stale, torn, or pointing at a compacted-away version all fall back
    * to the listing path, and sequences are dense by construction (next
    * = current + 1 under commit exclusion) so the first forward miss is
    * the true tip. */
  private val HintName = "_latest.hint"
  /** Commit-file GET counter (hint + commit parses), for specs proving
    * resolve cost stays O(1) as versions accumulate. */
  private[graft] val commitFileReads = new java.util.concurrent.atomic.AtomicLong
  /** Cap on files listed in one commit: beyond this the driver-side
    * manifest itself needs a tree structure (Iceberg's manifest lists);
    * fail loudly instead of degrading silently. */
  val MaxFilesPerCommit = 1000000

  /** Thrown when the optimistic commit CAS loses its version number to a
    * concurrent committer — a TYPED conflict so retry-capable callers
    * ([[transactionalMerge]]'s rebase loop) can distinguish "someone
    * else committed first, re-resolve and rebase" from real I/O
    * failures, which must stay fatal. Extends IOException so existing
    * fail-loud callers are unchanged. */
  final class CommitConflictException(msg: String)
    extends java.io.IOException(msg)

  /** The rebase-on-conflict policy of the whole merge family
    * ([[transactionalMerge]], [[transactionalAppendAll]], [[mergeInto]],
    * [[deleteByKeys]]) in ONE body: a lost commit CAS means another
    * writer claimed our version number — nothing about OUR batch is
    * wrong, so re-run `body` (each attempt re-resolves the new head,
    * re-checks its watermark, re-derives its affected files, and
    * re-commits at head+1). This is the SLOW path: [[commitOrRebase]]
    * first re-commits the attempt's already-written files directly
    * whenever the interleaved commit provably did not touch the
    * attempt's read set (different-table writers under one root), so
    * `body` only re-runs when the conflict actually invalidated it.
    * Bounded: past `maxRetries` the conflict propagates — fail-loud
    * beats livelock under real contention; at that point the deployment
    * needs a commit queue. A losing attempt's data files are
    * unreferenced orphans; [[vacuum]] reclaims them. */
  private def retryOnConflict[A](maxRetries: Int)(body: => A): A = {
    require(maxRetries >= 0, "maxRetries >= 0")
    var attempt = 0
    while (true) {
      try return body
      catch {
        case e: CommitConflictException =>
          if (attempt >= maxRetries) throw e
          attempt += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  private sealed trait CommitOutcome
  private final case class Committed(version: Long) extends CommitOutcome
  private case object AlreadyApplied extends CommitOutcome

  /** FILE-REUSING conflict rebase — the fast path [[retryOnConflict]]
    * sits behind: a lost commit CAS means another writer claimed our
    * version number, but when that interleaved commit provably did not
    * disturb anything this attempt's plan READ (`reusableUnder` — e.g.
    * the target table's entry list is identical under the new head),
    * the attempt's conclusions still hold verbatim, so its
    * already-written data files are re-committed directly at the new
    * head+1: zero recompute, zero re-write, no orphaned files. Writers
    * on DIFFERENT tables of one root (the CorpusIngest corpus+index
    * shape, several CDC streams sharing a warehouse root) thus each pay
    * exactly one data write however often they race; only a conflict
    * that touched OUR read set re-runs the attempt (the conflict
    * propagates to [[retryOnConflict]]). `alreadyAppliedUnder` wins
    * over everything: a racing replay that landed OUR watermark makes
    * the whole operation a no-op, reported as such. `carriedOf`
    * re-derives the carried entries FROM WHICHEVER HEAD the commit
    * lands on, so the interloper's files are never dropped. Bounded:
    * past `maxRebase` lost races in a row the conflict propagates —
    * same fail-loud-beats-livelock policy as the outer retry. */
  private def commitOrRebase(spark: SparkSession, fs: FileSystem,
      rootP: HPath, root: String, planned: Option[Commit],
      carriedOf: Seq[FileEntry] => Seq[FileEntry],
      added: Seq[FileEntry],
      reusableUnder: Commit => Boolean,
      alreadyAppliedUnder: Commit => Boolean = _ => false,
      maxRebase: Int = 3,
      freshEntries: Seq[FileEntry] = Nil): CommitOutcome = {
    // the attempt's NEWLY WRITTEN dirs (never the carried `keep`
    // entries riding in `added`): when this attempt is abandoned —
    // already-applied no-op, or a non-reusable conflict that forces a
    // re-run — those files are orphans from this very instant; eager
    // best-effort cleanup beats waiting a vacuum age horizon (a hot
    // retry loop would otherwise stack one orphan dir per lost race)
    def dropFresh(): Unit =
      freshEntries.map(e => new HPath(rootP, e.relPath).getParent)
        .distinct.foreach { d =>
          try fs.delete(d, true) catch { case _: Exception => () }
        }
    var entries = planned.map(_.entries).getOrElse(Nil)
    var version = planned.fold(1L)(_.version + 1L)
    var rebases = 0
    while (true) {
      try return Committed(
        writeCommit(fs, rootP, version, carriedOf(entries) ++ added,
          parent = Some(entries)))
      catch {
        case e: CommitConflictException =>
          if (rebases >= maxRebase) { dropFresh(); throw e }
          val nc = current(spark, root).getOrElse { dropFresh(); throw e }
          if (alreadyAppliedUnder(nc)) { dropFresh(); return AlreadyApplied }
          if (!reusableUnder(nc)) { dropFresh(); throw e }
          entries = nc.entries
          version = nc.version + 1L
          rebases += 1
      }
    }
    throw new IllegalStateException("unreachable")
  }

  /** The [[commitOrRebase]] reuse test every merge-family writer shares:
    * the interleaved commit left `table`'s entry list EXACTLY as this
    * attempt planned it (same files, same stats/blooms/sizes — FileEntry
    * equality), so the affected/untouched split, the rewrite, and the
    * row counts all still hold. */
  private def tableUnchanged(planned: Option[Commit], table: String)(
      nc: Commit): Boolean =
    nc.entries.filter(_.table == table) ==
      planned.map(_.entries.filter(_.table == table)).getOrElse(Nil)

  /** One immutable data file of one table version. `min`/`max` are
    * optional long stats of the table's declared stats column (empty for
    * footer-only files — those are never skipped). `bloom` is an optional
    * (column, base64-serialized BloomFilter) pair for EQUALITY-probe file
    * skipping on keys uncorrelated with the file layout — built by
    * [[indexBloom]], consumed by [[readPrunedEq]]. Values enter the
    * filter as the UTF-8 bytes of the column's canonical string cast, so
    * probes are type-agnostic and deterministic; no false negatives, so
    * skipping never loses a row.
    *
    * v2 extensions (round 17):
    *  - `statsName`: the COLUMN the primary min/max pair was computed
    *    over. Pre-v2 commits carry stats untagged; narrowing then trusts
    *    the caller's declared stats column (the only option), but a
    *    NAMED pair is only applied when the probe column matches — a
    *    table whose declared stats column drifted across writes can no
    *    longer have another column's range misread as key bounds (a
    *    silently-skipped matching file on a merge/delete path).
    *  - `bytes`: the file's length, recorded at write time from the
    *    same listStatus the writer already pays — so [[compact]] /
    *    [[compactIfFragmented]] size the table from the manifest in
    *    O(0) FS calls instead of one getFileStatus RPC per file per
    *    micro-batch (a multi-minute driver stall at 10^5 files on an
    *    object store).
    *  - `stats2` / `blooms2`: additional named (col, min, max) /
    *    (col, bloom) groups, so point-lookup pruning works on keys
    *    OTHER than the clustered one — the forget path every GDPR
    *    delete takes (doc-id deletes against a band-clustered minhash
    *    index, vec-id deletes against list-clustered IVF).
    *
    * v3 extensions (round 18):
    *  - `rows`: the file's row count, read from the parquet footer the
    *    writer just produced (a driver-side metadata GET, no data
    *    pass) — sizes Bloom filters to actual content and turns every
    *    "count the written files" probe into manifest arithmetic.
    *  - bloom payload strings carry EITHER an inline base64 filter
    *    (legacy, read-compat) OR a `@<relPath>` POINTER to an immutable
    *    content-addressed sidecar file under `<table>/_blooms/`. At the
    *    10^4–10^5-file steady state inline filters made every commit
    *    O(files × bloomCols × 60 KB) — rewritten each version, the
    *    manifest (not the data) became the dominant per-batch write.
    *    Pointers keep the commit line ~100 B per file; carried entries
    *    reuse the sidecar untouched, [[vacuum]] treats sidecars like
    *    data files, and content addressing dedups identical filters
    *    (every footer-only file shares ONE empty-bloom sidecar). A
    *    write unit's filters land PACKED in one object
    *    (`@<rel>.pack.bloom#<offset>:<len>` — [[writeBloomPack]]), so
    *    the per-commit sidecar OBJECT count is O(1), not
    *    O(files × bloomCols); plain `@<rel>` pointers stay readable. */
  final case class FileEntry(table: String, relPath: String,
                             min: Option[Long], max: Option[Long],
                             bloom: Option[(String, String)] = None,
                             statsName: Option[String] = None,
                             bytes: Option[Long] = None,
                             stats2: Seq[(String, Long, Long)] = Nil,
                             blooms2: Seq[(String, String)] = Nil,
                             rows: Option[Long] = None) {
    /** min/max recorded for column `c`, if any. The primary pair
      * answers when its recorded name matches — or, for pre-v2 unnamed
      * stats, when the CALLER's declared stats column (`declared`)
      * names `c` (legacy trust, the only information available). Named
      * mismatches fall through to `stats2`; no match means the file is
      * never skipped on `c`. */
    def statsFor(c: String, declared: Option[String] = None): Option[(Long, Long)] = {
      val primaryName = statsName.orElse(declared)
      val primary =
        if (primaryName.contains(c)) min.zip(max) else None
      primary.orElse(stats2.collectFirst {
        case (n, mn, mx) if n == c => (mn, mx) })
    }
    /** Serialized bloom filter recorded for column `c`, if any. */
    def bloomFor(c: String): Option[String] =
      bloom.collect { case (bc, b64) if bc == c => b64 }
        .orElse(blooms2.collectFirst { case (bc, b64) if bc == c => b64 })
    /** This entry with a bloom on `c` attached: replaces the primary
      * when it is absent or already on `c`; otherwise rides `blooms2`
      * (retrofitting a second key must not strip the first's coverage). */
    def withBloom(c: String, b64: String): FileEntry =
      if (bloom.forall(_._1 == c)) copy(bloom = Some((c, b64)))
      else copy(blooms2 = blooms2.filterNot(_._1 == c) :+ ((c, b64)))
  }

  final case class Commit(version: Long, entries: Seq[FileEntry])

  private def fsFor(spark: SparkSession, p: String): (FileSystem, HPath) = {
    val hp = new HPath(p)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    (fs, fs.makeQualified(hp))
  }

  private def uuid(): String = UUID.randomUUID().toString.replace("-", "")

  /** Evaluate one independent unit of write work per element
    * CONCURRENTLY (guide §2.6 — a multi-table publish's per-table
    * writes are independent Spark jobs; submitting them from driver
    * threads lets the next table's tasks back-fill executors freed by
    * the current table's stage tail), preserving the input order of
    * the results so commit bodies stay byte-deterministic. Each unit
    * writes to its own `d-<uuid>` dir; the only shared state is the
    * thread-safe FileSystem handle and Spark's scheduler. */
  private def inParallel[A, B](xs: Seq[A])(f: A => B): Seq[B] = {
    if (xs.lengthCompare(1) <= 0) xs.map(f)
    else {
      implicit val ec: ExecutionContext = ExecutionContext.global
      xs.map(x => Future(f(x))).map(Await.result(_, Duration.Inf))
    }
  }

  // ---------------------------------------------------------------- resolve

  /** Parsed body of one commit file: a self-contained SNAPSHOT (every
    * pre-v3 commit; every `CheckpointInterval`-th commit; `k-` sidecar
    * checkpoints) or a DELTA against the previous version — key
    * removals plus entry upserts (an upsert replaces an existing
    * (table, relPath) in place, new keys append). Deltas are what keep
    * the per-commit write O(changed files): a CDC sink at its
    * 10^4–10^5-file steady state used to rewrite the FULL entry list
    * every micro-batch, making the manifest — not the data — the
    * dominant per-batch write. */
  private[graft] sealed trait CommitBody
  private[graft] final case class Snapshot(entries: Seq[FileEntry])
    extends CommitBody
  private[graft] final case class DeltaBody(removes: Seq[(String, String)],
                                            upserts: Seq[FileEntry])
    extends CommitBody

  /** Apply one delta: removals first, then in-place upserts, then
    * appends of new keys — deterministic entry order, so a resolved
    * state equals the committing writer's list up to the position of
    * in-place-updated entries (content-identical either way). */
  private def applyDelta(state: Seq[FileEntry], d: DeltaBody): Seq[FileEntry] = {
    val rm = d.removes.toSet
    val up = d.upserts.map(e => (e.table, e.relPath) -> e).toMap
    val kept = state.filterNot(e => rm.contains((e.table, e.relPath)))
    val existing = kept.map(e => (e.table, e.relPath)).toSet
    kept.map(e => up.getOrElse((e.table, e.relPath), e)) ++
      d.upserts.filterNot(e => existing.contains((e.table, e.relPath)))
  }

  /** Write a full snapshot every N commits (amortizing resolve to O(1)
    * checkpoints + O(delta) line parses) — a var ONLY so specs can
    * drive the cadence cheaply; production uses the default. */
  private[graft] var CheckpointInterval = 16

  /** `k-<seq>.txt` checkpoint sidecars: a full snapshot of version seq,
    * written best-effort after checkpoint-cadence commits and
    * LOAD-BEARINGLY by [[compactLog]]/[[vacuum]] before they drop the
    * delta chain under retained versions. Never a CAS target — the
    * c-file is the commit; a missing k-file only lengthens the
    * backward walk. */
  private def checkpointName(seq: Long): String = f"k-$seq%020d.txt"

  /** Driver-side cache of the most recently resolved (version, entries)
    * per root — a (root, version) state is immutable, so a hit is valid
    * forever, and resolving a newer tip parses only the commits SINCE
    * the cached version (the warm path every per-batch writer takes). */
  private val stateCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, Seq[FileEntry])]()
  private val MaxStateCacheRoots = 64
  /** Test hook: simulate a cold driver (specs proving resolve cost
    * bounds must not ride the warm cache). */
  private[graft] def dropStateCacheForTest(): Unit = stateCache.clear()

  /** Full entry list of `version` under `cd`: walk backward collecting
    * deltas until a base (cached state, `k-` checkpoint, or snapshot
    * commit), then apply forward. Cost: O(1) base reads + O(deltas
    * since base); the warm path reads only commits newer than the
    * cache. Fail-loud on a broken chain (a delta whose base was
    * dropped without a checkpoint — [[compactLog]]/[[vacuum]] prevent
    * this by construction). */
  private def resolveEntries(fs: FileSystem, cd: HPath,
                             version: Long): Seq[FileEntry] = {
    val rootKey = fs.makeQualified(cd).toString
    val cached = Option(stateCache.get(rootKey))
    if (cached.exists(_._1 == version)) return cached.get._2
    var s = version
    var base: Seq[FileEntry] = null
    val deltas = scala.collection.mutable.ListBuffer.empty[DeltaBody]
    while (base == null) {
      if (cached.exists(_._1 == s)) base = cached.get._2
      else {
        val kp = new HPath(cd, checkpointName(s))
        val useK = fs.exists(kp)
        val body =
          if (useK) parseBody(fs, kp)
          else {
            val cp = new HPath(cd, fixedName(s))
            val p =
              if (fs.exists(cp)) cp
              else { // legacy uuid-named commit of this sequence
                val names = fs.listStatus(cd).map(_.getPath.getName)
                  .filter(n => versionOfName(n).contains(s)).sorted
                names.lastOption.map(n => new HPath(cd, n)).getOrElse(
                  throw new java.io.IOException(
                    s"broken commit chain under $cd: version $s missing " +
                      s"while resolving $version (compacted without a " +
                      "checkpoint?)"))
              }
            parseBody(fs, p)
          }
        body match {
          case Snapshot(es) => base = es
          case d: DeltaBody => deltas.prepend(d); s -= 1
        }
      }
    }
    val entries = deltas.foldLeft(base)(applyDelta)
    if (cached.forall(_._1 <= version)) {
      if (stateCache.size() >= MaxStateCacheRoots &&
          !stateCache.containsKey(rootKey))
        stateCache.clear()
      stateCache.put(rootKey, (version, entries))
    }
    entries
  }

  /** Latest committed state, or None for an uninitialized root. Partial
    * uploads (`.tmp-*`) and foreign files in `_commits` are ignored by
    * the name pattern. Fixed commit names make equal sequence numbers
    * impossible under the current protocol (the loser's rename fails on
    * destination-exists); should a legacy uuid-named root carry one,
    * the lexicographically last name wins deterministically.
    *
    * Resolve cost: O(1) in retained history — the `_latest.hint` fast
    * path reads the pointer and exists-probes forward to the dense tip,
    * never listing `_commits`; only hint-less (legacy/compacted) states
    * pay the full LIST. Entry resolution then parses only the commits
    * newer than the cached state ([[resolveEntries]]). */
  def current(spark: SparkSession, root: String): Option[Commit] = {
    val (fs, rootP) = fsFor(spark, root)
    val cd = new HPath(rootP, CommitDir)
    if (!fs.exists(cd)) return None
    latestName(fs, cd).map { n =>
      val CommitName(seq) = n
      Commit(seq.toLong, resolveEntries(fs, cd, seq.toLong))
    }
  }

  /** Name of the tip commit: hint + forward probes when possible,
    * full listing otherwise. */
  private def latestName(fs: FileSystem, cd: HPath): Option[String] = {
    val hinted = readHint(fs, cd).filter(h => fs.exists(new HPath(cd, fixedName(h))))
    hinted match {
      case Some(h) =>
        // sequences are dense (next = current + 1), so walk to the first
        // miss; fresh hints walk zero steps
        var s = h
        while (fs.exists(new HPath(cd, fixedName(s + 1)))) s += 1
        Some(fixedName(s))
      case None =>
        fs.listStatus(cd).map(_.getPath.getName)
          .filter(n => CommitName.pattern.matcher(n).matches()).sorted.lastOption
    }
  }

  private def readHint(fs: FileSystem, cd: HPath): Option[Long] =
    try {
      val p = new HPath(cd, HintName)
      if (!fs.exists(p)) None
      else {
        commitFileReads.incrementAndGet()
        val in = fs.open(p)
        val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString.trim
                   finally in.close()
        Some(text.toLong)
      }
    } catch { case _: Exception => None } // torn/corrupt hint -> listing path

  /** Best-effort hint refresh after a successful commit. Losing a race
    * here (or crashing before it) only costs the next reader some
    * forward probes or one listing — never correctness. */
  private def writeHint(fs: FileSystem, cd: HPath, version: Long): Unit =
    try {
      val tmp = new HPath(cd, s".tmp-hint-${uuid()}")
      val out = fs.create(tmp, false)
      try out.write(version.toString.getBytes(StandardCharsets.UTF_8))
      finally out.close()
      val dest = new HPath(cd, HintName)
      fs.delete(dest, false)
      if (!fs.rename(tmp, dest)) fs.delete(tmp, false)
    } catch { case _: Exception => () }

  /** The state as of a specific retained version (time travel). */
  def readAt(spark: SparkSession, root: String, table: String,
             version: Long): DataFrame = {
    val (fs, rootP) = fsFor(spark, root)
    val cd = new HPath(rootP, CommitDir)
    val retained = fs.exists(new HPath(cd, fixedName(version))) ||
      fs.listStatus(cd).map(_.getPath.getName)
        .exists(n => versionOfName(n).contains(version))
    if (!retained) throw new IllegalArgumentException(
      s"readAt: version $version not retained under $root (vacuumed?)")
    toDf(spark, rootP, resolveEntries(fs, cd, version), table)
  }

  /** Row-level diff between two retained snapshots: every row only in
    * `toVersion` tagged `'added'`, every row only in `fromVersion`
    * tagged `'removed'` (multiset semantics via exceptAll, so
    * duplicate-row cardinality changes surface too) — the
    * time-travel-powered change audit ("what did the last N commits
    * actually do to this table") that completes the snapshot surface
    * next to [[readAt]] / [[compact]] / [[vacuum]].
    *
    * Scale: two manifest resolves (O(1) checkpoints + O(delta) commit
    * parses each) + one hash-partitioned set difference per direction —
    * the standard full-row diff shuffle. Files shared by BOTH commits
    * are read twice but cancel; a dominant unchanged majority costs
    * scan + shuffle of the table, which is the honest lower bound for
    * row-level certainty (file-level identity can prune: entries with
    * equal (relPath, bytes) in both commits hold identical rows, and
    * [[entriesAt]] exposes exactly that for callers that want the
    * cheap screen first). */
  def snapshotDiff(spark: SparkSession, root: String, table: String,
                   fromVersion: Long, toVersion: Long): DataFrame = {
    val a = readAt(spark, root, table, fromVersion)
    val b = readAt(spark, root, table, toVersion)
    b.exceptAll(a).withColumn("change", lit("added"))
      .unionByName(a.exceptAll(b).withColumn("change", lit("removed")))
  }

  /** Delta body markers: `#` is outside the legal table-name alphabet,
    * so neither can collide with a snapshot entry line. Detection is by
    * PRESENCE of the `#delta` line, not position — the streaming reader
    * receives commit lines as an unordered batch. */
  private[graft] val DeltaMarker = "#delta"
  private[graft] val RemoveMarker = "#rm"

  private def parseBody(fs: FileSystem, p: HPath): CommitBody = {
    commitFileReads.incrementAndGet()
    val in = fs.open(p)
    val text = try scala.io.Source.fromInputStream(in, "UTF-8").mkString
               finally in.close()
    parseBodyLines(text.split("\n").iterator.filter(_.nonEmpty), p.toString)
  }

  /** Body parser shared with the streaming reader: lines with the
    * `#delta` marker anywhere form a [[DeltaBody]] (removal lines +
    * upsert entry lines); anything else is a [[Snapshot]]. */
  private[graft] def parseBodyLines(lines: Iterator[String],
                                    src: String): CommitBody = {
    val all = lines.toVector
    if (!all.contains(DeltaMarker)) Snapshot(parseEntryLines(all.iterator, src))
    else {
      val (rm, rest) = all.filterNot(_ == DeltaMarker)
        .partition(_.startsWith(RemoveMarker + "\t"))
      val removes = rm.map { line =>
        line.split("\t", -1) match {
          case Array(RemoveMarker, t, rel) => (t, rel)
          case _ => throw new java.io.IOException(
            s"corrupt delta removal line in $src: '${line.take(80)}'")
        }
      }
      DeltaBody(removes, parseEntryLines(rest.iterator, src))
    }
  }

  /** v2 line marker: `#` is outside the legal table-name alphabet
    * ([[writeData]]'s `[A-Za-z0-9._-]+` require), so a first field of
    * `#2` can never collide with a legacy line's table field. */
  private val V2Marker = "#2"
  /** Prefix marking a bloom payload as a SIDECAR POINTER (`@<relPath>`)
    * rather than an inline base64 filter — `@` is outside the base64
    * alphabet, so the two forms can never collide. */
  private[graft] val SidecarMark = "@"

  /** One commit line for one entry (see [[parseV2]] for the grammar). */
  private def entryLine(e: FileEntry): String = {
    val v2 = e.bytes.isDefined || e.statsName.isDefined ||
      e.stats2.nonEmpty || e.blooms2.nonEmpty || e.rows.isDefined ||
      e.bloom.exists(_._2.startsWith(SidecarMark))
    if (!v2) {
      val base =
        s"${e.table}\t${e.relPath}\t${e.min.fold("")(_.toString)}\t${e.max.fold("")(_.toString)}"
      e.bloom.fold(base) { case (bc, bb) => s"$base\t$bc\t$bb" }
    } else {
      def bloomGroup(c: String, payload: String): String =
        if (payload.startsWith(SidecarMark))
          s"P:${b64col(c)}:${b64col(payload.stripPrefix(SidecarMark))}"
        else s"B:${b64col(c)}:$payload"
      val groups =
        e.min.zip(e.max).map { case (mn, mx) =>
          s"S:${e.statsName.fold("")(b64col)}:$mn:$mx" }.toSeq ++
        e.stats2.map { case (c, mn, mx) => s"S:${b64col(c)}:$mn:$mx" } ++
        e.bloom.map { case (c, bb) => bloomGroup(c, bb) }.toSeq ++
        e.blooms2.map { case (c, bb) => bloomGroup(c, bb) } ++
        e.rows.map(n => s"R:$n").toSeq
      (Seq(V2Marker, e.table, e.relPath, e.bytes.fold("")(_.toString)) ++
        groups).mkString("\t")
    }
  }
  private def b64col(c: String): String =
    java.util.Base64.getEncoder.encodeToString(c.getBytes(StandardCharsets.UTF_8))
  private def unb64col(s: String): String =
    new String(java.util.Base64.getDecoder.decode(s), StandardCharsets.UTF_8)

  /** Commit-line parser shared with the streaming reader (which gets its
    * lines from a text file-source batch, not an FS open). Reads BOTH
    * forms: the legacy 4/6-field lines of pre-v2 commits (read-compat
    * shim — stats stay unnamed, [[FileEntry.statsFor]] trusts the
    * declared column for them) and the `#2`-marked form carrying byte
    * size plus repeated named stats/bloom groups. */
  private[graft] def parseEntryLines(lines: Iterator[String],
                                     src: String): Seq[FileEntry] =
    lines.map { line =>
      val f = line.split("\t", -1)
      if (f.length >= 4 && f(0) == V2Marker) parseV2(f, line, src)
      else f match {
        case Array(t, rel, mn, mx) =>
          FileEntry(t, rel,
            if (mn.isEmpty) None else Some(mn.toLong),
            if (mx.isEmpty) None else Some(mx.toLong))
        // bloom-carrying form: two extra fields (column, base64 filter)
        case Array(t, rel, mn, mx, bc, bb) if bc.nonEmpty && bb.nonEmpty =>
          FileEntry(t, rel,
            if (mn.isEmpty) None else Some(mn.toLong),
            if (mx.isEmpty) None else Some(mx.toLong),
            Some((bc, bb)))
        case other => throw new java.io.IOException(
          s"corrupt commit line in $src: '${line.take(80)}'")
      }
    }.toVector

  /** `#2 <TAB> table <TAB> relPath <TAB> bytes? <TAB> group...` where
    * each group is `S:<b64(col)>:<min>:<max>` (col empty for legacy
    * unnamed stats carried forward), `B:<b64(col)>:<bloomB64>` (inline
    * filter, read-compat), `P:<b64(col)>:<b64(relPath)>` (sidecar
    * pointer, parsed into the `@<relPath>` payload form) or `R:<rows>`
    * (row count). The FIRST group of each kind is the primary slot; the
    * rest ride stats2/blooms2. Column names travel base64'd so no
    * column name can collide with the `:` group delimiter. */
  private def parseV2(f: Array[String], line: String, src: String): FileEntry = {
    def corrupt(): Nothing = throw new java.io.IOException(
      s"corrupt v2 commit line in $src: '${line.take(80)}'")
    var e = FileEntry(f(1), f(2), None, None,
      bytes = if (f(3).isEmpty) None else Some(f(3).toLong))
    def addBloom(c: String, payload: String): Unit =
      if (e.bloom.isEmpty && e.blooms2.isEmpty)
        e = e.copy(bloom = Some((c, payload)))
      else e = e.copy(blooms2 = e.blooms2 :+ ((c, payload)))
    f.drop(4).filter(_.nonEmpty).foreach { g =>
      g.split(":", -1) match {
        case Array("S", c, mn, mx) =>
          val name = if (c.isEmpty) None else Some(unb64col(c))
          if (e.min.isEmpty && e.stats2.isEmpty)
            e = e.copy(min = Some(mn.toLong), max = Some(mx.toLong),
              statsName = name)
          else
            e = e.copy(stats2 = e.stats2 :+
              ((name.getOrElse(corrupt()), mn.toLong, mx.toLong)))
        case Array("B", c, bb) if c.nonEmpty && bb.nonEmpty =>
          addBloom(unb64col(c), bb)
        case Array("P", c, pp) if c.nonEmpty && pp.nonEmpty =>
          addBloom(unb64col(c), SidecarMark + unb64col(pp))
        case Array("R", n) if n.nonEmpty =>
          e = e.copy(rows = Some(n.toLong))
        case _ => corrupt()
      }
    }
    e
  }

  /** Sequence number of a commit file name, if it is one. */
  private[graft] def versionOfName(name: String): Option[Long] = name match {
    case CommitName(seq) => Some(seq.toLong)
    case _ => None
  }

  /** Entries of a specific retained version, None if not retained. */
  private[graft] def entriesAt(spark: SparkSession, root: String,
                               version: Long): Option[Seq[FileEntry]] = {
    val (fs, rootP) = fsFor(spark, root)
    val cd = new HPath(rootP, CommitDir)
    if (!fs.exists(cd)) return None
    val retained = fs.exists(new HPath(cd, fixedName(version))) ||
      fs.listStatus(cd).map(_.getPath.getName)
        .exists(n => versionOfName(n).contains(version))
    if (!retained) None else Some(resolveEntries(fs, cd, version))
  }

  /** Oldest retained version, None for an uninitialized root. */
  private[graft] def minRetainedVersion(spark: SparkSession,
                                        root: String): Option[Long] = {
    val (fs, rootP) = fsFor(spark, root)
    val cd = new HPath(rootP, CommitDir)
    if (!fs.exists(cd)) return None
    fs.listStatus(cd).map(_.getPath.getName)
      .flatMap(versionOfName).minOption
  }

  // ----------------------------------------------------------------- commit

  /** Write the next commit file: stage under a dot-name, then a
    * SINGLE-OBJECT move to the FIXED name `c-<seq>.txt` — the only
    * rename in the protocol, and of one small file. The fixed
    * destination is what makes optimistic concurrency sound: two
    * committers targeting the same sequence race their renames, and the
    * second rename FAILS on destination-exists — enforced by
    * `FileContext.rename(..., Options.Rename.NONE)`, which the Hadoop
    * FS spec guarantees to reject an existing destination on every
    * compliant filesystem (Delta's HDFSLogStore mechanism), with a
    * `FileSystem.rename` fallback for schemes lacking a FileContext
    * binding — so exactly one committer per sequence number succeeds;
    * the loser re-resolves and retries. The listStatus pre-check below
    * is a fast-fail courtesy, not the exclusion mechanism. */
  /** Test-only interposition point: when set, runs ONCE at the next
    * [[writeCommit]] entry (self-clearing, so an interleaved commit the
    * hook itself performs cannot recurse) — how specs inject a
    * deterministic concurrent commit between a writer's plan and its
    * CAS, driving the [[commitOrRebase]] conflict paths without a
    * flaky thread race. Never set in production code. */
  private[graft] var testBeforeCommit: Option[() => Unit] = None

  private def writeCommit(fs: FileSystem, rootP: HPath, version: Long,
                          entries: Seq[FileEntry],
                          parent: Option[Seq[FileEntry]] = None): Long = {
    testBeforeCommit.foreach { h => testBeforeCommit = None; h() }
    require(entries.size <= MaxFilesPerCommit,
      s"commit would list ${entries.size} files (> $MaxFilesPerCommit): " +
        "compact the table or shard it before committing")
    entries.foreach { e =>
      require(!e.table.contains("\t") && !e.relPath.contains("\t") &&
        !e.table.contains("\n") && !e.relPath.contains("\n"),
        s"illegal table/path characters: ${e.table} ${e.relPath}")
      (e.bloom.toSeq ++ e.blooms2).foreach { case (bc, bb) =>
        require(bc.nonEmpty && bb.nonEmpty &&
          !s"$bc$bb".exists(ch => ch == '\t' || ch == '\n'),
          s"illegal bloom fields for ${e.relPath}")
      }
      e.stats2.foreach { case (c, _, _) =>
        require(c.nonEmpty, s"unnamed secondary stats for ${e.relPath}")
      }
    }
    val cd = new HPath(rootP, CommitDir)
    fs.mkdirs(cd)
    // entries with no v2 payload keep the legacy 4/6-field line
    // byte-identical (txn watermarks, hand-built entries); anything
    // carrying bytes / rows / a named stats pair / a sidecar pointer /
    // extra groups writes the `#2` form (see [[parseV2]]).
    //
    // Commit body: a DELTA against `parent` whenever the writer knows
    // the parent state and the delta is actually smaller — the change
    // that makes per-commit bytes ∝ the batch's changed files instead
    // of O(table files). Checkpoint-cadence versions and parentless
    // commits write the full snapshot; a best-effort `k-` checkpoint
    // sidecar lands after checkpoint-cadence delta commits so resolve
    // never walks more than CheckpointInterval deltas.
    val snapshotBody = entries.map(entryLine).mkString("", "\n", "\n")
    val deltaLines: Option[String] = parent.flatMap { p =>
      val nKey = entries.map(e => (e.table, e.relPath) -> e).toMap
      val pKey = p.map(e => (e.table, e.relPath) -> e).toMap
      val removes = p.collect {
        case e if !nKey.contains((e.table, e.relPath)) =>
          s"$RemoveMarker\t${e.table}\t${e.relPath}"
      }
      val upserts = entries.filter(e =>
        !pKey.get((e.table, e.relPath)).contains(e))
      if (removes.length + upserts.length >= entries.length) None
      else Some((DeltaMarker +: removes) .mkString("", "\n", "\n") +
        upserts.map(entryLine).mkString("", "\n", "\n"))
    }
    val checkpointDue = version % CheckpointInterval.toLong == 0L
    val body = deltaLines.getOrElse(snapshotBody)
    val tmp = new HPath(cd, s".tmp-${uuid()}")
    val out = fs.create(tmp, false)
    try out.write(body.getBytes(StandardCharsets.UTF_8)) finally out.close()
    val dest = new HPath(cd, fixedName(version))
    def conflict(): Nothing = {
      fs.delete(tmp, false)
      throw new CommitConflictException(
        s"commit conflict: version $version already committed under $rootP — " +
          "re-resolve current() and retry")
    }
    // fast-fail if a newer sequence (or a legacy uuid-named file of this
    // sequence, which the fixed-name rename cannot exclude) already exists
    val clash = fs.listStatus(cd).map(_.getPath.getName).exists {
      case CommitName(seq) => seq.toLong >= version
      case _ => false
    }
    if (clash) conflict()
    // The decisive step: atomic claim of the fixed name.
    // FileContext.rename with Options.Rename.NONE is SPEC-guaranteed to
    // fail when the destination exists (the mechanism Delta's
    // HDFSLogStore uses) — exclusion by contract, not by a particular
    // FileSystem implementation's behavior. Schemes without a
    // FileContext binding fall back to FileSystem.rename, whose
    // destination-exists=false behavior holds on HDFS and on Hadoop
    // 3.4 local file: (pinned empirically by ManifestTableSpec) but is
    // version-dependent on older local filesystems.
    val claimed =
      try {
        val fc = org.apache.hadoop.fs.FileContext.getFileContext(
          dest.toUri, fs.getConf)
        try {
          fc.rename(tmp, dest, org.apache.hadoop.fs.Options.Rename.NONE)
          true
        } catch {
          case _: org.apache.hadoop.fs.FileAlreadyExistsException => false
          case e: java.io.IOException
              if e.getMessage != null && e.getMessage.contains("already exists") =>
            false
        }
      } catch {
        case _: org.apache.hadoop.fs.UnsupportedFileSystemException =>
          fs.rename(tmp, dest)
      }
    if (!claimed) conflict()
    // the committer KNOWS the full state it just committed: seed the
    // resolve cache so the next resolve under this root parses nothing
    val rootKey = fs.makeQualified(cd).toString
    if (stateCache.size() >= MaxStateCacheRoots &&
        !stateCache.containsKey(rootKey))
      stateCache.clear()
    stateCache.put(rootKey, (version, entries))
    // best-effort checkpoint sidecar on the cadence (only needed when
    // the commit itself was a delta); a crash here only lengthens the
    // next cold resolve's backward walk — never correctness
    if (checkpointDue && deltaLines.isDefined)
      try writeCheckpoint(fs, cd, version, entries)
      catch { case _: Exception => () }
    writeHint(fs, cd, version)
    version
  }

  /** Write the `k-<seq>.txt` snapshot sidecar for `version` (idempotent:
    * the content is a pure function of the version, so an existing file
    * is already right). */
  private def writeCheckpoint(fs: FileSystem, cd: HPath, version: Long,
                              entries: Seq[FileEntry]): Unit = {
    val dest = new HPath(cd, checkpointName(version))
    if (fs.exists(dest)) return
    val tmp = new HPath(cd, s".tmp-k-${uuid()}")
    val out = fs.create(tmp, false)
    try out.write(entries.map(entryLine).mkString("", "\n", "\n")
      .getBytes(StandardCharsets.UTF_8))
    finally out.close()
    if (!fs.rename(tmp, dest)) fs.delete(tmp, false)
  }

  // ------------------------------------------------------------- data write

  /** Counter of per-file FS stat RPCs paid by maintenance sizing
    * ([[compact]] / [[compactIfFragmented]] fallbacks for pre-v2
    * entries with no recorded byte size) — specs assert it stays ZERO
    * on the steady-state path, where sizes come from the manifest. */
  private[graft] val fileStatCalls = new java.util.concurrent.atomic.AtomicLong

  /** Counter of [[writeData]] invocations — the observability hook for
    * the file-reusing conflict rebase (a rebase that re-commits already
    * written files must NOT re-run the attempt's data write). */
  private[graft] val dataWrites = new java.util.concurrent.atomic.AtomicLong

  /** Default bloom sizing when a file's row count is unknown (pre-v3
    * entries), and the hard cap keeping one file's filter bounded. */
  private val DefaultBloomItems = 100000L
  private val MaxBloomItems = 20000000L
  private def bloomSize(items: Long): Long =
    math.max(64L, math.min(items, MaxBloomItems))

  /** Canonical long form a column's per-file stats are recorded in:
    * epoch-DAY for DATE (a date→long cast does not exist, so
    * date-clustered tables previously recorded NO usable range and a
    * date-bounded retention purge could not prune discovery),
    * epoch-SECOND for TIMESTAMP (exactly what `cast(ts AS long)` always
    * computed — unit stability with every pre-v3 commit), long cast
    * otherwise. [[impliedRange]]'s literal canonicalizers mirror these
    * units. */
  private def canonLongExpr(c: String,
      dt: Option[org.apache.spark.sql.types.DataType]): Column = dt match {
    case Some(org.apache.spark.sql.types.DateType) =>
      unix_date(col(c)).cast("long")
    case _ => col(c).cast("long")
  }

  /** The LONG-form string a bloom insertion/probe uses for `c` — the
    * canonical long rendered as a string (dates via epoch-day; a plain
    * try_cast on a DATE column is an analysis error). */
  private def bloomLongFormExpr(c: String,
      dt: Option[org.apache.spark.sql.types.DataType]): Column = dt match {
    case Some(org.apache.spark.sql.types.DateType) =>
      unix_date(col(c)).cast("string")
    case _ => expr(s"CAST(try_cast(`$c` AS LONG) AS STRING)")
  }

  /** Per-file metadata out of [[statsBloomPass]]: canonical-long
    * min/max per stats column (absent = no non-null values) and a
    * serialized Bloom filter per bloom column. */
  private final case class PerFileMeta(stats: Map[String, (Long, Long)],
                                       blooms: Map[String, Array[Byte]])

  /** Mutable per-file accumulator of the combined pass — min/max slots
    * per stats column plus one Bloom filter per bloom column, sized for
    * this file. Partial accumulators of one file merge by min/min,
    * max/max and bloom bit-OR (same creation parameters → compatible
    * bit arrays), so the result is partitioning-invariant. */
  private final class SBAcc(nS: Int, nB: Int, expectedItems: Long,
                            fpp: Double) extends Serializable {
    val mins = Array.fill(nS)(Long.MaxValue)
    val maxs = Array.fill(nS)(Long.MinValue)
    val seen = Array.fill(nS)(false)
    val blooms = Array.fill(nB)(
      org.apache.spark.util.sketch.BloomFilter.create(
        bloomSize(expectedItems), fpp))
  }

  /** ONE distributed pass computing, per just-read data file, BOTH the
    * canonical min/max stats of every `statsCols` column AND a Bloom
    * filter of every `bloomCols` column. Write paths previously re-read
    * their fresh files twice (stats job, then bloom job) — the named
    * ~+6% bench cost of round 17's secondary blooms; one combined scan
    * halves it and reads each needed column exactly once.
    *
    * Each bloom key inserts under BOTH its raw string rendering (what
    * [[readPrunedEq]] probes) and its canonical long-form rendering
    * (what [[readPrunedIn]] probes): a DOUBLE column's raw form is
    * "4.0" while the long probe is "4", and probing a filter that only
    * held the raw form would be a guaranteed FALSE NEGATIVE — a
    * silently dropped matching file. Two insertions at most per row per
    * column; `expectedOf(fileName)` supplies the per-file insertion
    * budget (2×rows from the footer counts at write time; the caller's
    * estimate for pre-v3 retrofits), so filters are SIZED TO CONTENT —
    * a compacted 128 MB file gets the bits its fpp needs, a 500-row CDC
    * file no longer pays the fixed 50k-item allocation. Files with no
    * rows are absent from the result. */
  private def statsBloomPass(spark: SparkSession, paths: Seq[String],
      schema: org.apache.spark.sql.types.StructType,
      statsCols: Seq[String], bloomCols: Seq[String],
      expectedOf: String => Long, fpp: Double = 0.03)
      : Map[String, PerFileMeta] = {
    if (statsCols.isEmpty && bloomCols.isEmpty) return Map.empty
    val nS = statsCols.length
    val nB = bloomCols.length
    def dtOf(c: String) = schema.find(_.name == c).map(_.dataType)
    val exprs = Seq(input_file_name().as("__f")) ++
      statsCols.zipWithIndex.map { case (c, i) =>
        canonLongExpr(c, dtOf(c)).as(s"__s$i") } ++
      bloomCols.zipWithIndex.flatMap { case (kc, j) => Seq(
        col(kc).cast("string").as(s"__k$j"),
        bloomLongFormExpr(kc, dtOf(kc)).as(s"__l$j")) }
    def update(a: SBAcc, r: Row): SBAcc = {
      var i = 0
      while (i < nS) {
        if (!r.isNullAt(1 + i)) {
          val v = r.getLong(1 + i)
          if (!a.seen(i)) { a.seen(i) = true; a.mins(i) = v; a.maxs(i) = v }
          else {
            if (v < a.mins(i)) a.mins(i) = v
            if (v > a.maxs(i)) a.maxs(i) = v
          }
        }
        i += 1
      }
      var j = 0
      while (j < nB) {
        val k = r.getString(1 + nS + 2 * j)
        if (k != null) {
          a.blooms(j).putBinary(k.getBytes(StandardCharsets.UTF_8))
          val l = r.getString(2 + nS + 2 * j)
          if (l != null && l != k)
            a.blooms(j).putBinary(l.getBytes(StandardCharsets.UTF_8))
        }
        j += 1
      }
      a
    }
    def merge(a: SBAcc, b: SBAcc): SBAcc = {
      var i = 0
      while (i < nS) {
        if (b.seen(i)) {
          if (!a.seen(i)) { a.seen(i) = true; a.mins(i) = b.mins(i); a.maxs(i) = b.maxs(i) }
          else {
            if (b.mins(i) < a.mins(i)) a.mins(i) = b.mins(i)
            if (b.maxs(i) > a.maxs(i)) a.maxs(i) = b.maxs(i)
          }
        }
        i += 1
      }
      var j = 0
      while (j < nB) { a.blooms(j).mergeInPlace(b.blooms(j)); j += 1 }
      a
    }
    spark.read.parquet(paths: _*).select(exprs: _*).rdd
      .map(r => (r.getString(0), r))
      .combineByKey(
        (r: Row) => update(new SBAcc(nS, nB,
          expectedOf(r.getString(0).split("/").last), fpp), r),
        (a: SBAcc, r: Row) => update(a, r),
        (a: SBAcc, b: SBAcc) => merge(a, b))
      .collect()
      .map { case (f, a) =>
        f -> PerFileMeta(
          statsCols.zipWithIndex.collect {
            case (c, i) if a.seen(i) => c -> ((a.mins(i), a.maxs(i))) }.toMap,
          bloomCols.zipWithIndex.map { case (c, j) =>
            c -> graft.expressions.BloomExprs.toBytes(a.blooms(j)) }.toMap)
      }.toMap
  }

  /** Write `df` as immutable data files under `<table>/d-<uuid>/` and
    * return their manifest entries: per-file byte sizes (from the
    * listStatus the writer already pays), per-file ROW COUNTS (from the
    * just-written parquet footers — a driver metadata GET per file, no
    * data pass; they size the blooms and replace every "count the
    * written files" job downstream), and ONE combined distributed pass
    * ([[statsBloomPass]]) computing NAMED canonical min/max stats of
    * `statsCol` + `extraStatsCols` AND a right-sized per-file Bloom
    * filter of `bloomCol` + `extraBloomCols` — so files appended AFTER
    * an [[indexBloom]] call keep the table's bloom coverage instead of
    * silently never being skipped. Bloom payloads land in
    * content-addressed SIDECAR files (`<table>/_blooms/`), the entry
    * carrying only the pointer — commit bodies stay O(~100 B) per file
    * regardless of filter size. A file with NO non-null key rows gets
    * the shared EMPTY filter (rejects every probe): sound — a rowless
    * or all-null-key file can never hold a probed equality match — and
    * it keeps footer-only schema keepers out of every point lookup.
    * The files are INVISIBLE to readers until a commit lists them —
    * writing is not publishing. */
  private def writeData(spark: SparkSession, rootP: HPath, fs: FileSystem,
                        table: String, df: DataFrame,
                        statsCol: Option[String],
                        bloomCol: Option[String] = None,
                        extraStatsCols: Seq[String] = Nil,
                        extraBloomCols: Seq[String] = Nil): Seq[FileEntry] = {
    require(table.matches("[A-Za-z0-9._-]+"), s"illegal table name: $table")
    dataWrites.incrementAndGet()
    val dir = s"$table/d-${uuid()}"
    val full = new HPath(rootP, dir)
    df.write.parquet(full.toString)
    val listed = fs.listStatus(full)
      .filter(_.getPath.getName.endsWith(".parquet"))
      .sortBy(_.getPath.getName).toSeq
    require(listed.nonEmpty, s"writeData: no parquet files produced at $full")
    val conf = spark.sparkContext.hadoopConfiguration
    val statsCols = (statsCol.toSeq ++ extraStatsCols).distinct
    val bloomCols = (bloomCol.toSeq ++ extraBloomCols).distinct
    // INTEGRAL and DATE stats columns read their exact min/max straight
    // from the parquet FOOTERS this loop already opens for row counts:
    // parquet records signed-exact INT32/INT64 chunk stats, and
    // [[canonLongExpr]] is the identity on integrals / epoch-day on
    // DATE (which parquet stores as INT32 epoch days) — so when a write
    // carries no bloom columns, the whole post-write stats SCAN of the
    // just-written bytes disappears (guide §1.2: a full re-read of
    // every written file per write unit, gone). Non-integral stats or
    // any bloom column keep the one combined scan, unchanged.
    val footerable = statsCols.filter { c =>
      df.schema.find(_.name == c).map(_.dataType).exists {
        case org.apache.spark.sql.types.ByteType |
             org.apache.spark.sql.types.ShortType |
             org.apache.spark.sql.types.IntegerType |
             org.apache.spark.sql.types.LongType |
             org.apache.spark.sql.types.DateType => true
        case _ => false
      }
    }
    val footerOnly = bloomCols.isEmpty && statsCols.forall(footerable.contains)
    // footer opens are independent metadata reads — do them
    // concurrently instead of one driver round-trip per file
    val footerMeta: Seq[(String, Long, Map[String, (Long, Long)])] =
      inParallel(listed) { s =>
        val in = org.apache.parquet.hadoop.util.HadoopInputFile
          .fromPath(s.getPath, conf)
        val r = org.apache.parquet.hadoop.ParquetFileReader.open(in)
        try {
          val stats: Map[String, (Long, Long)] =
            if (!footerOnly || footerable.isEmpty) Map.empty
            else {
              import scala.jdk.CollectionConverters._
              val blocks = r.getFooter.getBlocks.asScala.toSeq
              footerable.flatMap { c =>
                val chunks = blocks.flatMap(_.getColumns.asScala
                  .filter(_.getPath.toDotString == c))
                var mn = Long.MaxValue
                var mx = Long.MinValue
                var seen = true
                var any = false
                chunks.foreach { cc =>
                  val st = cc.getStatistics
                  if (st == null || st.isEmpty)
                    seen = false // unrecorded chunk stats: record nothing
                  else if (st.hasNonNullValue) {
                    val (a, b) = (st.genericGetMin, st.genericGetMax) match {
                      case (x: java.lang.Long, y: java.lang.Long) =>
                        (x.longValue(), y.longValue())
                      case (x: java.lang.Integer, y: java.lang.Integer) =>
                        (x.longValue(), y.longValue())
                      case _ => seen = false; (0L, 0L)
                    }
                    if (seen) {
                      any = true
                      if (a < mn) mn = a
                      if (b > mx) mx = b
                    }
                  } // all-null chunk: contributes nothing, like the scan
                }
                // absent stats are SOUND (the file is never skipped);
                // partial/unreadable stats record nothing rather than
                // a possibly-narrower-than-true envelope
                if (seen && any && chunks.nonEmpty) Some(c -> ((mn, mx)))
                else None
              }.toMap
            }
          (s.getPath.getName, r.getRecordCount, stats)
        } finally r.close()
      }
    val rowsByName: Map[String, Long] =
      footerMeta.map { case (n, rows, _) => n -> rows }.toMap
    val perFile =
      if (rowsByName.values.forall(_ == 0L)) Map.empty[String, PerFileMeta]
      else if (footerOnly) footerMeta.map { case (n, _, st) =>
        s"/$n" -> PerFileMeta(st, Map.empty) }.toMap
      else statsBloomPass(spark, Seq(full.toString), df.schema, statsCols,
        bloomCols,
        fname => 2L * rowsByName.getOrElse(fname, DefaultBloomItems / 2))
    lazy val emptyPointer =
      SidecarMark + writeBloomSidecar(fs, rootP, table, emptyBloomBytes())
    def metaOf(n: String): Option[PerFileMeta] = perFile.collectFirst {
      case (f, m) if f.endsWith("/" + n) => m }
    // one pack object per write unit instead of one sidecar per
    // (file, column) — see [[writeBloomPack]]
    val packed = writeBloomPack(fs, rootP, table,
      for {
        s <- listed; n = s.getPath.getName
        m <- metaOf(n).toSeq
        kc <- bloomCols
        bytes <- m.blooms.get(kc).toSeq
      } yield ((n, kc), bytes))
    listed.map { s =>
      val n = s.getPath.getName
      val meta = metaOf(n)
      val stats = meta.fold(Map.empty[String, (Long, Long)])(_.stats)
      val primary = statsCols.headOption.flatMap(stats.get)
      var e = FileEntry(table, s"$dir/$n",
        primary.map(_._1), primary.map(_._2),
        statsName = statsCols.headOption.filter(_ =>
          primary.isDefined),
        bytes = Some(s.getLen),
        stats2 = statsCols.drop(1).flatMap(c =>
          stats.get(c).map { case (a, b) => (c, a, b) }),
        rows = rowsByName.get(n))
      bloomCols.foreach { kc =>
        e = e.withBloom(kc, packed.getOrElse((n, kc), emptyPointer))
      }
      e
    }
  }

  /** Serialized empty Bloom filter — what a file with no non-null key
    * rows carries: rejects every probe, which is exact for such a
    * file. Content addressing makes every footer-only file in a table
    * share ONE sidecar. */
  private def emptyBloomBytes(): Array[Byte] =
    graft.expressions.BloomExprs.toBytes(
      org.apache.spark.util.sketch.BloomFilter.create(1L, 0.03))

  /** Write `bytes` as an immutable CONTENT-ADDRESSED bloom sidecar
    * under `<table>/_blooms/` and return its relPath. Content
    * addressing makes the write idempotent (a same-content racer lands
    * on the same name; either rename outcome leaves the right bytes),
    * dedups identical filters across files and versions, and lets
    * carried entries reuse their sidecar untouched forever — a sidecar
    * is only ever deleted by [[vacuum]], and only when NO retained
    * version points at it. */
  private def writeBloomSidecar(fs: FileSystem, rootP: HPath,
                                table: String, bytes: Array[Byte]): String = {
    val hex = sha16(bytes)
    val rel = s"$table/_blooms/b-$hex.bloom"
    writeSidecarObject(fs, rootP, rel, bytes)
    rel
  }

  private def sha16(bytes: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256")
      .digest(bytes).take(16).map("%02x".format(_)).mkString

  private def writeSidecarObject(fs: FileSystem, rootP: HPath, rel: String,
                                 bytes: Array[Byte]): Unit = {
    val dest = new HPath(rootP, rel)
    if (!fs.exists(dest)) {
      val dirP = dest.getParent
      fs.mkdirs(dirP)
      val tmp = new HPath(dirP, s".tmp-${uuid()}")
      val out = fs.create(tmp, false)
      try out.write(bytes) finally out.close()
      if (!fs.rename(tmp, dest)) {
        fs.delete(tmp, false) // lost a same-content race: dest is right
        require(fs.exists(dest), s"bloom sidecar write failed: $dest")
      }
    }
  }

  /** Write ALL of one write-unit's (file, column) bloom filters as ONE
    * content-addressed PACK object (`p-<hex>.pack.bloom` — the `.bloom`
    * suffix keeps [[vacuum]]'s walker and dir pruning working unchanged)
    * and return per-(fileName, column) pointer payloads of the form
    * `@<rel>#<offset>:<len>`. One commit's worth of filters was
    * previously files × bloomCols separate sidecar objects — at the
    * 10^4-file steady state the per-commit object count, not the bytes,
    * dominated the manifest dir (guide §6 small files). Identical filter
    * bytes dedup to one slice inside the pack; the pack itself is
    * content-addressed, so replays and same-content racers stay
    * idempotent exactly like single sidecars. */
  private def writeBloomPack(fs: FileSystem, rootP: HPath, table: String,
      filters: Seq[((String, String), Array[Byte])])
      : Map[(String, String), String] = {
    if (filters.isEmpty) return Map.empty
    val offsets = scala.collection.mutable.LinkedHashMap
      .empty[String, (Array[Byte], Long)]
    var off = 0L
    val slices = filters.map { case (k, bytes) =>
      val (_, o) = offsets.getOrElseUpdate(sha16(bytes),
        { val r = (bytes, off); off += bytes.length; r })
      (k, (o, bytes.length))
    }
    val bos = new java.io.ByteArrayOutputStream()
    offsets.values.foreach { case (b, _) => bos.write(b) }
    val pack = bos.toByteArray
    val rel = s"$table/_blooms/p-${sha16(pack)}.pack.bloom"
    writeSidecarObject(fs, rootP, rel, pack)
    slices.map { case (k, (o, l)) =>
      k -> s"$SidecarMark$rel#$o:$l" }.toMap
  }

  /** Driver-side cache of immutable sidecar payloads — content-addressed
    * files never change, so a hit is valid forever; bounded by a crude
    * clear-when-full (right-sized filters are small, and correctness
    * never depends on a hit). */
  private val bloomSidecarCache =
    new java.util.concurrent.ConcurrentHashMap[String, Array[Byte]]()
  private val MaxBloomCacheEntries = 4096

  /** Materialize a bloom payload: `@<relPath>` pointers read their
    * sidecar (cached), inline base64 payloads (pre-v3 commits) decode
    * directly. */
  private def bloomBytesOf(fs: FileSystem, rootP: HPath,
                           payload: String): Array[Byte] =
    if (!payload.startsWith(SidecarMark))
      java.util.Base64.getDecoder.decode(payload)
    else {
      // `@<rel>` reads the whole sidecar; `@<rel>#<offset>:<len>` slices
      // a pack — the pack is cached WHOLE (one object per write unit,
      // so every file's probe of one commit shares a single read)
      val raw = payload.stripPrefix(SidecarMark)
      val (relPath, slice) = raw.indexOf('#') match {
        case -1 => (raw, None)
        case i =>
          val Array(o, l) = raw.substring(i + 1).split(":")
          (raw.substring(0, i), Some((o.toLong, l.toInt)))
      }
      val p = new HPath(rootP, relPath)
      val key = p.toString
      val whole = {
        val hit = bloomSidecarCache.get(key)
        if (hit != null) hit
        else {
          val in = fs.open(p)
          val bytes = try {
            val bos = new java.io.ByteArrayOutputStream()
            val buf = new Array[Byte](65536)
            var n = in.read(buf)
            while (n >= 0) { bos.write(buf, 0, n); n = in.read(buf) }
            bos.toByteArray
          } finally in.close()
          if (bloomSidecarCache.size() >= MaxBloomCacheEntries)
            bloomSidecarCache.clear()
          bloomSidecarCache.put(key, bytes)
          bytes
        }
      }
      slice match {
        case None => whole
        case Some((o, l)) =>
          java.util.Arrays.copyOfRange(whole, o.toInt, o.toInt + l)
      }
    }

  /** Deserialize a bloom payload into a probe-ready filter. */
  private def bloomFilterOf(fs: FileSystem, rootP: HPath, payload: String)
      : org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(bloomBytesOf(fs, rootP, payload)))

  /** Rows across a [[writeData]] result — manifest arithmetic over the
    * footer counts it always records, replacing the metadata-count
    * Spark job every write path used to pay. */
  private def writtenRows(written: Seq[FileEntry]): Long =
    written.map(_.rows.getOrElse(sys.error(
      s"writeData entry without a row count: ${written.head.relPath}"))).sum

  /** [[writeData]] under the ONE-EXECUTION + footer-only discipline
    * shared by every rewrite path (transactionalMerge,
    * transactionalAppendAll, deleteWhere, mergeInto): write FIRST, then
    * count what was written (footer row counts off the manifest
    * entries) — an isEmpty pre-check would run the plan twice, and a
    * non-deterministic frame could then commit rows the probe never
    * saw. An EMPTY result either collapses to ONE footer-only file
    * (`keepSchemaIfEmpty` — no other file of the table survives the
    * commit, so the schema must; the deleteWhere readability contract)
    * or deletes the dir and contributes no entry. The schema for the
    * collapse reads back from the written footers — nothing of the
    * original plan re-executes. */
  private def writeDataNonEmptyOr(spark: SparkSession, rootP: HPath,
                                  fs: FileSystem, table: String,
                                  df: DataFrame, statsCol: Option[String],
                                  bloomCol: Option[String],
                                  keepSchemaIfEmpty: Boolean,
                                  extraBloomCols: Seq[String] = Nil,
                                  extraStatsCols: Seq[String] = Nil): Seq[FileEntry] = {
    val written = writeData(spark, rootP, fs, table, df, statsCol, bloomCol,
      extraStatsCols = extraStatsCols, extraBloomCols = extraBloomCols)
    val dir = new HPath(rootP, written.head.relPath).getParent
    val n = writtenRows(written)
    if (n > 0L) written
    else if (!keepSchemaIfEmpty) { fs.delete(dir, true); Nil }
    else {
      val schema = spark.read.parquet(dir.toString).schema
      fs.delete(dir, true)
      val empty = spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
      // bloom columns ride along so the schema keeper carries (empty)
      // filters like every other file of the table: a rowless file can
      // never hold an equality match, so rejecting all probes is exact,
      // and the keeper stops being scanned by every point lookup forever
      writeData(spark, rootP, fs, table, empty.repartition(1), statsCol,
        bloomCol, extraStatsCols = extraStatsCols,
        extraBloomCols = extraBloomCols)
    }
  }

  private def entriesOf(c: Option[Commit], table: String): Seq[FileEntry] =
    c.map(_.entries.filter(_.table == table)).getOrElse(Nil)

  private def toDf(spark: SparkSession, rootP: HPath, entries: Seq[FileEntry],
                   table: String, mergeSchema: Boolean = false): DataFrame = {
    val mine = entries.filter(_.table == table)
    require(mine.nonEmpty, s"no table '$table' in this version")
    spark.read.option("mergeSchema", mergeSchema.toString)
      .parquet(mine.map(e => new HPath(rootP, e.relPath).toString): _*)
  }

  // ------------------------------------------------------------------ reads

  /** Manifest-resolved read of the latest version. With `mergeSchema`,
    * versions whose appends ADDED columns read back under the union
    * schema, older files null-filling the new columns — schema evolution
    * without rewriting history (additions only; a type change or drop
    * still needs an explicit migration via [[overwrite]]). */
  def read(spark: SparkSession, root: String, table: String,
           mergeSchema: Boolean = false): DataFrame = {
    val (_, rootP) = fsFor(spark, root)
    val c = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    toDf(spark, rootP, c.entries, table, mergeSchema)
  }

  /** Read with FILE SKIPPING on the stats column: only files whose
    * [min,max] intersects [lo,hi] are opened (files with no stats are
    * always opened). The predicate is re-applied, so results equal a
    * full scan — skipping is purely I/O reduction, the readSkipping
    * contract of [[DataLayout]]. */
  def readPruned(spark: SparkSession, root: String, table: String,
                 statsCol: String, lo: Long, hi: Long): DataFrame = {
    val (_, rootP) = fsFor(spark, root)
    val c = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(c), table)
    require(mine.nonEmpty, s"no table '$table' under $root")
    val keep = mine.filter(e => e.statsFor(statsCol, Some(statsCol)) match {
      case Some((mn, mx)) => mx >= lo && mn <= hi
      case None => true
    })
    val base =
      if (keep.isEmpty) toDf(spark, rootP, mine, table).where(lit(false))
      else spark.read.parquet(keep.map(e => new HPath(rootP, e.relPath).toString): _*)
    val cl = canonLongExpr(statsCol,
      base.schema.find(_.name == statsCol).map(_.dataType))
    base.filter(cl >= lo && cl <= hi)
  }

  /** [[readPruned]] for a SET of probe values instead of one range,
    * optionally pinned to a retained `version` (time travel): only
    * files whose [min,max] contains at least one probe value are
    * opened, and the membership predicate is re-applied so results
    * equal a full scan. This is how a manifest-committed IVF index
    * expresses probed-list pruning — the probe set is the nprobe
    * best lists, tiny by construction — while the version pin gives
    * the racing-reader isolation a `list_id=` directory can't.
    *
    * COMPOSES with [[indexBloom]]: a file surviving the min/max test
    * is additionally probed against its Bloom filter when one exists
    * on `statsCol`, so files inside a probe's [min,max] envelope that
    * do not actually CONTAIN any probed value are skipped too — the
    * case range stats alone can never catch once values interleave
    * across many files. Bloom misses are exact (no false negatives),
    * so results still equal a full scan; files without a bloom on
    * `statsCol` are simply never bloom-skipped. */
  def readPrunedIn(spark: SparkSession, root: String, table: String,
                   statsCol: String, values: Seq[Long],
                   version: Option[Long] = None): DataFrame = {
    require(values.nonEmpty, "readPrunedIn: empty probe set")
    val (fs, rootP) = fsFor(spark, root)
    val entries = version match {
      case Some(v) => entriesAt(spark, root, v).getOrElse(
        throw new IllegalArgumentException(
          s"readPrunedIn: version $v not retained under $root (vacuumed?)"))
      case None => current(spark, root).getOrElse(
        throw new IllegalArgumentException(
          s"no committed table under $root")).entries
    }
    val mine = entries.filter(_.table == table)
    require(mine.nonEmpty, s"no table '$table' under $root")
    val keep = mine.filter(e => keepInSet(fs, rootP, e, statsCol, values))
    val base =
      if (keep.isEmpty) toDf(spark, rootP, mine, table).where(lit(false))
      else spark.read.parquet(
        keep.map(e => new HPath(rootP, e.relPath).toString): _*)
    base.filter(canonLongExpr(statsCol,
      base.schema.find(_.name == statsCol).map(_.dataType)).isin(values: _*))
  }

  /** The [[readPrunedIn]] skip test for one file: min/max range first
    * (the primary pair when its recorded/declared name matches, or a
    * named secondary group), then the per-file Bloom filter when one
    * covers `statsCol` (primary or secondary slot). */
  private def keepInSet(fs: FileSystem, rootP: HPath, e: FileEntry,
                        statsCol: String, values: Seq[Long]): Boolean = {
    val rangeOk = e.statsFor(statsCol, Some(statsCol)) match {
      case Some((mn, mx)) => values.exists(v => v >= mn && v <= mx)
      case None => true
    }
    rangeOk && (e.bloomFor(statsCol) match {
      case Some(payload) =>
        val bf = bloomFilterOf(fs, rootP, payload)
        values.exists(v => bf.mightContainBinary(bloomKeyBytes(v)))
      case None => true
    })
  }

  /** Kept-vs-total file counts for a probe SET, with and without the
    * bloom composition — (keptBloomComposed, keptMinMaxOnly, total),
    * the observability hook for [[readPrunedIn]]'s skip rate. */
  def prunedInStats(spark: SparkSession, root: String, table: String,
                    statsCol: String, values: Seq[Long],
                    version: Option[Long] = None): (Long, Long, Long) = {
    val (fs, rootP) = fsFor(spark, root)
    val entries = version match {
      case Some(v) => entriesAt(spark, root, v).getOrElse(
        throw new IllegalArgumentException(
          s"prunedInStats: version $v not retained under $root"))
      case None => current(spark, root).getOrElse(
        throw new IllegalArgumentException(
          s"no committed table under $root")).entries
    }
    val mine = entries.filter(_.table == table)
    val keptRange = mine.count(e => e.statsFor(statsCol, Some(statsCol)) match {
      case Some((mn, mx)) => values.exists(v => v >= mn && v <= mx)
      case None => true
    })
    val keptBloom = mine.count(e => keepInSet(fs, rootP, e, statsCol, values))
    (keptBloom.toLong, keptRange.toLong, mine.size.toLong)
  }

  /** Kept-vs-total file counts for a pruning range — observability for
    * specs and ops dashboards. Uses the primary stats pair regardless
    * of its recorded name (the caller supplies no column here; this is
    * the raw clustered-range view). */
  def pruneStats(spark: SparkSession, root: String, table: String,
                 lo: Long, hi: Long): (Long, Long) = {
    val c = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(c), table)
    val kept = mine.count(e => (e.min, e.max) match {
      case (Some(mn), Some(mx)) => mx >= lo && mn <= hi
      case _ => true
    })
    (kept.toLong, mine.size.toLong)
  }

  // ------------------------------------------------------------ bloom index

  /** UTF-8 bytes of the canonical string form a value is probed/inserted
    * under — both sides of the bloom contract go through here. */
  private def bloomKeyBytes(v: Any): Array[Byte] =
    String.valueOf(v).getBytes(StandardCharsets.UTF_8)

  /** Metadata-only version that attaches a per-file Bloom filter of
    * `keyCol` to every data file of `table`: min/max stats skip
    * RANGE predicates on the clustered column, blooms skip EQUALITY
    * probes on keys UNCORRELATED with the layout (a digest, a user id, a
    * join key) — the case range stats can never help with. Data files are
    * carried byte-identical (not rewritten, not even re-listed); only the
    * commit file changes, so this composes like [[compact]]: a
    * background maintenance op, never an outage.
    *
    * One distributed pass ([[statsBloomPass]]) builds every file's
    * filter, SIZED per file from the manifest-recorded row count when
    * the entry carries one (v3 writes) and from `expectedItemsPerFile`
    * otherwise; payloads land in content-addressed sidecar files, the
    * commit carrying only pointers — the commit body stays ~100 B per
    * file however large the filters are.
    *
    * Files written AFTER this call (appends, compactions) carry no bloom
    * and are simply never skipped — re-run indexBloom to re-cover them.
    * Returns the new version. */
  def indexBloom(spark: SparkSession, root: String, table: String,
                 keyCol: String, expectedItemsPerFile: Long = 50000L,
                 fpp: Double = 0.03): Long = {
    val (fs, rootP) = fsFor(spark, root)
    val cur = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(cur), table)
    require(mine.nonEmpty, s"no table '$table' under $root")
    val rowsByName: Map[String, Long] = mine.flatMap(e =>
      e.rows.map(r => e.relPath.split("/").last -> r)).toMap
    val paths = mine.map(e => new HPath(rootP, e.relPath).toString)
    val blooms = statsBloomPass(spark, paths,
      spark.read.parquet(paths: _*).schema, Nil, Seq(keyCol),
      fname => rowsByName.get(fname).map(2L * _)
        .getOrElse(expectedItemsPerFile), fpp)
    // one pack per retrofit call (see [[writeBloomPack]]), keyed here by
    // the entry's relPath since retrofits span multiple write dirs
    val packed = writeBloomPack(fs, rootP, table,
      for {
        e <- mine
        m <- blooms.collectFirst {
          case (f, mm) if f.endsWith(e.relPath) => mm }.toSeq
        bytes <- m.blooms.get(keyCol).toSeq
      } yield ((e.relPath, keyCol), bytes))
    val updated = mine.map { e =>
      packed.get((e.relPath, keyCol)).fold(e)(e.withBloom(keyCol, _))
      // footer-only files keep no bloom, are never skipped
    }
    writeCommit(fs, rootP, cur.version + 1L,
      cur.entries.filterNot(_.table == table) ++ updated,
      parent = Some(cur.entries))
  }

  /** Equality-probe read with Bloom file skipping: only files whose
    * filter might contain `value` (plus files with no bloom on `keyCol`)
    * are opened. No false negatives, and the predicate is re-applied, so
    * the result equals a full scan filtered to `keyCol = value` (string
    * equality on the canonical cast, mirroring [[indexBloom]]'s
    * insertion form). The point-lookup twin of [[readPruned]]. */
  def readPrunedEq(spark: SparkSession, root: String, table: String,
                   keyCol: String, value: Any): DataFrame = {
    val (fs, rootP) = fsFor(spark, root)
    val c = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(c), table)
    require(mine.nonEmpty, s"no table '$table' under $root")
    val probe = bloomKeyBytes(value)
    val keep = mine.filter { e =>
      e.bloomFor(keyCol) match {
        case Some(payload) =>
          bloomFilterOf(fs, rootP, payload).mightContainBinary(probe)
        case None => true
      }
    }
    val base =
      if (keep.isEmpty) toDf(spark, rootP, mine, table).where(lit(false))
      else spark.read.parquet(keep.map(e => new HPath(rootP, e.relPath).toString): _*)
    base.filter(col(keyCol).cast("string") === lit(String.valueOf(value)))
  }

  /** Kept-vs-total file counts for an equality probe — [[pruneStats]]'s
    * bloom twin. */
  def bloomPruneStats(spark: SparkSession, root: String, table: String,
                      keyCol: String, value: Any): (Long, Long) = {
    val (fs, rootP) = fsFor(spark, root)
    val c = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(c), table)
    val probe = bloomKeyBytes(value)
    val kept = mine.count { e =>
      e.bloomFor(keyCol) match {
        case Some(payload) =>
          bloomFilterOf(fs, rootP, payload).mightContainBinary(probe)
        case None => true
      }
    }
    (kept.toLong, mine.size.toLong)
  }

  // ----------------------------------------------------------------- writes

  /** All-or-nothing multi-table publish (T1). Every table's data files
    * are fully written BEFORE the single commit file appears; a failure
    * during any write aborts with the previous version still serving.
    * Tables absent from `tables` carry over unchanged from the current
    * version (publishing a subset never drops the rest). Returns the new
    * version. */
  def publish(spark: SparkSession, root: String, tables: Map[String, DataFrame],
              statsCols: Map[String, String] = Map.empty,
              bloomCols: Map[String, String] = Map.empty,
              extraBloomCols: Map[String, Seq[String]] = Map.empty,
              extraStatsCols: Map[String, Seq[String]] = Map.empty): Long = {
    require(tables.nonEmpty, "publish: no tables")
    val (fs, rootP) = fsFor(spark, root)
    fs.mkdirs(rootP)
    val cur = current(spark, root)
    val fresh = inParallel(tables.toSeq.sortBy(_._1)) { case (name, df) =>
      writeData(spark, rootP, fs, name, df, statsCols.get(name),
        bloomCols.get(name),
        extraStatsCols = extraStatsCols.getOrElse(name, Nil),
        extraBloomCols = extraBloomCols.getOrElse(name, Nil))
    }.flatten
    val carried = cur.map(_.entries.filterNot(e => tables.contains(e.table)))
      .getOrElse(Nil)
    writeCommit(fs, rootP, cur.fold(1L)(_.version + 1L), carried ++ fresh,
      parent = cur.map(_.entries))
  }

  /** Single-table full replace. */
  def overwrite(spark: SparkSession, root: String, table: String, df: DataFrame,
                statsCol: Option[String] = None,
                bloomCol: Option[String] = None,
                extraBloomCols: Seq[String] = Nil): Long =
    publish(spark, root, Map(table -> df),
      statsCol.fold(Map.empty[String, String])(c => Map(table -> c)),
      bloomCol.fold(Map.empty[String, String])(c => Map(table -> c)),
      if (extraBloomCols.isEmpty) Map.empty else Map(table -> extraBloomCols))

  /** [[publish]] gated by declarative expectations — the engine-side
    * analog of the reference's constraint-rejecting transactional load
    * (the database refuses a violating INSERT and the WHOLE transaction
    * rolls back, `main.py:173-195` + the DDL's PK/UNIQUE/NOT NULL/CHECK
    * constraints): every table's checks run FIRST
    * ([[graft.operators.Validate.expectationSuite]] — all checks in one
    * aggregation pass per table, a NULL verdict counts as a violation),
    * and any violation aborts with the failing check names before a
    * single data file is written — the previous version keeps serving.
    * Each checked frame is lineage-cut so the validation and the write
    * see the SAME rows even for non-deterministic inputs. Returns the
    * committed version. */
  def publishChecked(spark: SparkSession, root: String,
                     tables: Map[String, DataFrame],
                     checks: Map[String, Seq[(String, Column)]],
                     uniqueKeys: Map[String, Seq[Seq[String]]] = Map.empty,
                     foreignKeys: Seq[(String, String, Seq[String], String, Seq[String])] = Nil,
                     statsCols: Map[String, String] = Map.empty,
                     bloomCols: Map[String, String] = Map.empty): Long = {
    require(checks.keySet.subsetOf(tables.keySet),
      s"checks reference unknown tables: ${checks.keySet -- tables.keySet}")
    require(uniqueKeys.keySet.subsetOf(tables.keySet),
      s"uniqueKeys reference unknown tables: ${uniqueKeys.keySet -- tables.keySet}")
    foreignKeys.foreach { case (n, ct, cc, pt, pc) =>
      require(tables.contains(ct) && tables.contains(pt),
        s"foreign key $n references unknown tables ($ct -> $pt)")
      require(cc.nonEmpty && cc.length == pc.length,
        s"foreign key $n: child/parent column lists must align")
    }
    def hasChecks(name: String) =
      checks.get(name).exists(_.nonEmpty) ||
        uniqueKeys.get(name).exists(_.nonEmpty) ||
        foreignKeys.exists(fk => fk._2 == name || fk._4 == name)
    val cut = tables.map { case (name, df) =>
      name -> (if (hasChecks(name)) graft.operators.Lineage.cut(df) else df)
    }
    val rowFailures = checks.toSeq.sortBy(_._1).flatMap { case (name, cs) =>
      if (cs.isEmpty) Nil
      else graft.operators.Validate.expectationSuite(cut(name), cs)
        .filter(!col("pass"))
        .select(col("check"), col("n_violations")).collect()
        .map(r => s"$name.${r.getString(0)} (${r.getLong(1)} violations)")
    }
    // PK/UNIQUE are not row-local: one groupBy per key set; NULL keys
    // group together (the T-SQL single-NULL uniqueness shape)
    val dupFailures = uniqueKeys.toSeq.sortBy(_._1).flatMap { case (name, keys) =>
      keys.flatMap { k =>
        require(k.nonEmpty, s"empty unique key for $name")
        val dups = cut(name).groupBy(k.map(col): _*)
          .count().filter(col("count") > 1L).count()
        if (dups > 0L)
          Some(s"$name.unique(${k.mkString(",")}) ($dups duplicate keys)")
        else None
      }
    }
    // FK integrity: non-null child keys with no parent row (SQL
    // semantics: a NULL FK component passes). One anti-join per
    // relation — Catalyst broadcasts dim-sized parents.
    val fkFailures = foreignKeys.flatMap { case (cname, ct, cc, pt, pc) =>
      val child = cut(ct).select(cc.map(col): _*).na.drop("any")
      val parent = cut(pt).select(pc.zip(cc).map {
        case (p, c) => col(p).as(c) }: _*)
      val orphans = child.join(parent, cc, "left_anti").count()
      if (orphans > 0L) Some(s"$ct.$cname ($orphans orphaned rows)")
      else None
    }
    val failures = rowFailures ++ dupFailures ++ fkFailures
    if (failures.nonEmpty)
      throw new IllegalStateException(
        s"publishChecked: constraint violations — nothing committed: " +
          failures.mkString("; "))
    publish(spark, root, cut, statsCols, bloomCols)
  }

  /** Idempotent incremental append (S4/J2, `load_data_conditionally`
    * main.py:45-59): anti-join `incoming` against the CURRENT version's
    * keys, write only the fresh rows as new files, commit old+new. A
    * re-run appends 0 rows and creates NO new version. Unlike the
    * rename-based [[IncrementalLoad.appendNew]] there is no staging
    * step to get wrong: the anti-join reads the old files while the new
    * files are written elsewhere, and nothing is visible until the
    * commit lands. Returns rows appended. */
  def appendNew(spark: SparkSession, root: String, table: String,
                incoming: DataFrame, key: Seq[String],
                statsCol: Option[String] = None,
                bloomCol: Option[String] = None,
                extraBloomCols: Seq[String] = Nil,
                extraStatsCols: Seq[String] = Nil): Long = {
    val (fs, rootP) = fsFor(spark, root)
    fs.mkdirs(rootP)
    val cur = current(spark, root)
    val prior = entriesOf(cur, table)
    if (prior.isEmpty) {
      // write FIRST, count, commit only if non-empty — one execution of
      // `incoming` even when it is non-deterministic, and the same
      // "0 rows -> no new version" contract as the initialized path
      // (an intentionally-empty table is publish/overwrite's job)
      val newEntries = writeData(spark, rootP, fs, table, incoming, statsCol,
        bloomCol, extraStatsCols = extraStatsCols,
        extraBloomCols = extraBloomCols)
      val newDir = new HPath(rootP, newEntries.head.relPath).getParent
      val n = writtenRows(newEntries)
      if (n == 0L) { fs.delete(newDir, true); return 0L }
      val carried = cur.map(_.entries).getOrElse(Nil)
      writeCommit(fs, rootP, cur.fold(1L)(_.version + 1L),
        carried ++ newEntries, parent = cur.map(_.entries))
      return n
    }
    val existing = toDf(spark, rootP, prior, table)
    val fresh = IncrementalLoad.newRowsOnly(incoming, existing, key)
    // write FIRST, then count the written files (a parquet metadata-only
    // count) — one execution of the anti-join, no staging step, and the
    // old files the plan reads are untouched throughout
    val newEntries = writeData(spark, rootP, fs, table, fresh, statsCol,
      bloomCol, extraStatsCols = extraStatsCols,
      extraBloomCols = extraBloomCols)
    val newDir = new HPath(rootP, newEntries.head.relPath).getParent
    val n = writtenRows(newEntries)
    if (n == 0L) { fs.delete(newDir, true); return 0L } // no new version
    writeCommit(fs, rootP, cur.get.version + 1L,
      cur.get.entries ++ newEntries, parent = Some(cur.get.entries))
    n
  }

  /** Targeted deletion at FILE granularity: only files that contain a
    * matching row are rewritten (manifest stats have already bounded
    * which files those can be for stats-correlated predicates); all
    * other files are carried into the new version untouched —
    * byte-identical, not even re-read at commit time. Crash-consistent
    * ACROSS files, unlike the per-partition swap loop of
    * [[IncrementalLoad.deleteWhere]]: either the single new commit
    * lands (all affected files replaced at once) or nothing changes.
    * Returns (filesRewritten, rowsDeleted). */
  /** Necessary [lo, hi] bounds on `c`'s canonical-long stats values
    * implied by `pred`'s CONJUNCTS, or None when nothing bounds the
    * column. Sound for file skipping: pred ⇒ each conjunct, so every
    * matching row satisfies each extracted bound; the bounds are then
    * WIDENED by 1 on each side because manifest stats are min/max of
    * the canonical long form ([[statExprFor]] — `cast(col AS long)`
    * truncates toward zero, so the stats value can sit up to one below
    * or above the raw value the predicate compared). Bounds arrive as
    * EXACT BigDecimals and widen via floor−1 / ceil+1 in exact
    * arithmetic, SATURATING to unbounded when the widened bound leaves
    * Long range — the previous double pipeline rounded snowflake-scale
    * literals (~1.5e18) by up to ~512 and wrapped beyond Long range,
    * either of which could exclude a file holding genuinely matching
    * rows (a silently incomplete purge). `colType` selects the literal
    * canonicalizer (numeric identity / epoch-day / epoch-second) and
    * gates cast-transparency: a `CAST(c AS t)` reference counts as `c`
    * only when the cast is provably widening from the column's real
    * type (Cast.canUpCast) — through a narrowing cast a non-ANSI
    * overflow-wrapped raw value can match the predicate from far
    * outside the implied range. Handled shapes: >=, >, <=, <, =, <=>,
    * IN and BETWEEN (as its desugared conjunction) between such a
    * reference and accepted literals, either operand order, combined
    * through AND. Anything else (OR, NOT, UDFs, rejected literals,
    * NaN) contributes no bound — never unsound, just no narrowing. */
  private[graft] def impliedRange(pred: Column, c: String,
      colType: Option[org.apache.spark.sql.types.DataType] = None)
      : Option[(Long, Long)] = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    import org.apache.spark.sql.types.{DataType, DateType, DoubleType,
      FloatType, TimestampType}
    val pointCanon: Any => Option[BigDecimal] = colType match {
      case Some(DateType) => ColumnBridge.canonDate
      case Some(TimestampType) => ColumnBridge.canonTimestamp
      case _ => ColumnBridge.canonNumeric
    }
    // when the comparison WIDENS to double — floating column, floating
    // literal, or unknown column type (assume the worst) — a literal
    // matches its whole double-preimage band, not a point: every raw
    // value within ±ulp of the literal's double form compares equal.
    // An exact column against an exact literal compares exactly and
    // keeps the point interval.
    val colFloating = colType.exists(dt =>
      dt == FloatType || dt == DoubleType)
    def litFloating(v: Any): Boolean =
      v.isInstanceOf[java.lang.Float] || v.isInstanceOf[java.lang.Double]
    val toCanon: Any => Option[(BigDecimal, BigDecimal)] = v =>
      pointCanon(v).flatMap { p =>
        if (!colFloating && colType.isDefined && !litFloating(v))
          Some((p, p))
        else {
          val d = p.toDouble
          if (d.isInfinite || d.isNaN) None // unbounded band: no bound
          else { val u = BigDecimal(math.ulp(d)); Some((p - u, p + u)) }
        }
      }
    val castOk: DataType => Boolean = target => colType.exists(ct =>
      org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(ct, target))
    val (lo, hi) = ColumnBridge.impliedNumericBounds(pred, c, toCanon, castOk)
    if (lo.isEmpty && hi.isEmpty) None
    else {
      // floor/ceil alone absorb long-cast truncation: a matching row
      // v >= lo has trunc-toward-zero(v) >= floor(lo) (v >= 0 gives
      // trunc = floor(v) >= floor(lo); v < 0 gives trunc = ceil(v) >=
      // v >= lo >= floor(lo)), symmetrically trunc(v) <= ceil(hi) for
      // v <= hi — so the recorded stat of every matching row lands
      // inside [floor(lo), ceil(hi)] and no extra widening is needed.
      // (The pre-exact-bounds ±1 existed to absorb DOUBLE rounding of
      // the bounds themselves; bounds are exact BigDecimal now, and
      // double-widened comparisons already carry their ulp band.)
      //
      // Columns whose raw values ARE integers (integral types, DATE in
      // epoch-day) tighten further: inclusive lo rounds UP (no integer
      // sits in (floor(lo), lo)), and a STRICT bound excludes its own
      // integer — `k > 32` admits no row below 33, `k < 20` none above
      // 19. Float/double/timestamp columns keep the conservative
      // rounding: fractional raw values sit strictly between the bound
      // and its neighbors and still truncate onto floor(lo)/ceil(hi).
      // Scale-0 decimals qualify: their raw values are integers, and
      // the out-of-Long concern is moot — a row matching an
      // in-Long-range bound is itself in range and castable (its stat
      // is recorded), while out-of-Long LITERALS already saturate the
      // bound side to unbounded below.
      import org.apache.spark.sql.types.{ByteType, ShortType,
        IntegerType, LongType, DecimalType}
      val integralStats = colType.exists {
        case ByteType | ShortType | IntegerType | LongType | DateType => true
        case d: DecimalType => d.scale == 0
        case _ => false
      }
      val minL = BigDecimal(Long.MinValue)
      val maxL = BigDecimal(Long.MaxValue)
      val loL = lo.fold(Long.MinValue) { case (bd, strict) =>
        val w =
          if (integralStats && strict)
            bd.setScale(0, BigDecimal.RoundingMode.FLOOR) + 1
          else if (integralStats)
            bd.setScale(0, BigDecimal.RoundingMode.CEILING)
          else bd.setScale(0, BigDecimal.RoundingMode.FLOOR)
        // out of Long range on EITHER side -> unbounded: stats of rows
        // beyond Long range are cast-saturated (double) or cast-null
        // (decimal) and a representable clamp could still skip the file
        // holding them
        if (w < minL || w > maxL) Long.MinValue else w.toLongExact
      }
      val hiL = hi.fold(Long.MaxValue) { case (bd, strict) =>
        val w =
          if (integralStats && strict)
            bd.setScale(0, BigDecimal.RoundingMode.CEILING) - 1
          else if (integralStats)
            bd.setScale(0, BigDecimal.RoundingMode.FLOOR)
          else bd.setScale(0, BigDecimal.RoundingMode.CEILING)
        if (w > maxL || w < minL) Long.MaxValue else w.toLongExact
      }
      Some((loL, hiL))
    }
  }

  def deleteWhere(spark: SparkSession, root: String, table: String,
                  predicate: Column, statsCol: Option[String] = None,
                  bloomCol: Option[String] = None,
                  extraBloomCols: Seq[String] = Nil,
                  extraStatsCols: Seq[String] = Nil): (Long, Long) = {
    val (fs, rootP) = fsFor(spark, root)
    val cur = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(cur), table)
    require(mine.nonEmpty, s"no table '$table' under $root")
    val delCond = coalesce(predicate, lit(false)) // NULL means KEEP
    // discovery narrowing for PREDICATE deletes: a conjunct of the
    // predicate that bounds a stats-covered column bounds every
    // matching row, so files whose recorded [min,max] misses the
    // implied range provably hold no match — the affected-file scan
    // reads only in-range files, the readPruned shape on a write path.
    // EVERY column with recorded stats participates (the declared
    // primary, legacy unnamed primaries under the declared name, and
    // any secondary stats group); per-column necessity intersects.
    // TYPE-GUARDED: conjunct literals are numeric, so narrowing applies
    // only to NUMERIC-typed columns — on a STRING column Spark coerces
    // the comparison to DOUBLE and a decimal-formatted value ("4.00")
    // long-casts to NULL, i.e. it is invisible to the recorded min/max
    // while still matching the predicate; skipping by those stats would
    // silently leave matching rows undeleted. Arbitrary predicates (no
    // extractable conjunct) scan everything, exactly as before.
    val schema = toDf(spark, rootP, cur.entries, table).schema
    def colType(c: String): Option[org.apache.spark.sql.types.DataType] =
      schema.find(_.name == c).map(_.dataType)
    def numericCol(c: String): Boolean = colType(c)
      .exists(_.isInstanceOf[org.apache.spark.sql.types.NumericType])
    // range narrowing applies to numeric columns AND date/timestamp
    // columns (whose stats are recorded canonically — epoch-day /
    // epoch-second — and whose literals canonicalize the same way);
    // impliedRange picks the matching canonicalizer per column type
    def rangeNarrowable(c: String): Boolean = colType(c).exists {
      case _: org.apache.spark.sql.types.NumericType => true
      case org.apache.spark.sql.types.DateType => true
      case org.apache.spark.sql.types.TimestampType => true
      case _ => false
    }
    val statCols = (statsCol.toSeq ++ mine.flatMap(e =>
      e.statsName.toSeq ++ e.stats2.map(_._1))).distinct
    val ranged = statCols.filter(rangeNarrowable).foldLeft(mine) { (cand, sc) =>
      impliedRange(predicate, sc, colType(sc)) match {
        case Some((lo, hi)) => cand.filter(e =>
          e.statsFor(sc, statsCol) match {
            case Some((mn, mx)) => mx >= lo && mn <= hi
            case None => true
          })
        case None => cand
      }
    }
    // equality/IN conjuncts additionally probe per-file BLOOMS on any
    // covered column (the deleteByKeys narrowing, reached through a
    // predicate): a file whose filter rejects every pinned value
    // provably holds no match. TYPE-GUARDED per (column type, literal)
    // pair — only the combinations whose canonical insertion form is
    // guaranteed hit by a match qualify:
    //  - STRING column = STRING literal: same-type string equality, the
    //    raw-form insertion IS the value;
    //  - EXACT-NUMERIC column (integral/decimal) = exact integral
    //    literal: the widened comparison stays exact, so a match means
    //    numeric equality with integer L at ANY magnitude and the row's
    //    LONG-cast form is exactly L;
    //  - any FLOATING side (float/double column, or Float/Double /
    //    numeric-string literal): the comparison widens to DOUBLE, and
    //    above 2^53 MANY distinct long-cast row values satisfy equality
    //    with one double while only one long form is probed — a
    //    guaranteed false negative — so the literal must be integral
    //    AND |L| <= 2^53;
    // anything else (fractional literals — rendering ambiguity across
    // numeric types; numerics against string columns — the "4.00"
    // coercion hole) skips narrowing on that column. A single
    // non-qualifying IN member disables the whole column (probing a
    // subset would be a false negative).
    val scanSet = ranged
      .flatMap(e => (e.bloom.toSeq ++ e.blooms2).map(_._1)).distinct
      .foldLeft(ranged) { (cand, c) =>
        import org.apache.spark.sql.types._
        val colIsString = colType(c).contains(StringType)
        val colIsNumeric = numericCol(c)
        val colIsExact = colType(c).exists {
          case ByteType | ShortType | IntegerType | LongType => true
          case _: DecimalType => true
          case _ => false
        }
        val TwoP53 = 1L << 53
        def longForm(l: Long): Option[Array[Byte]] =
          Some(String.valueOf(l).getBytes(StandardCharsets.UTF_8))
        // double path: integral-valued and within exact-double range
        def fromDouble(d: Double): Option[Array[Byte]] =
          if (!d.isNaN && !d.isInfinite && d == math.floor(d) &&
            math.abs(d) <= TwoP53.toDouble) longForm(d.toLong) else None
        def probeForm(v: Any): Option[Array[Byte]] = v match {
          case s: String if colIsString =>
            Some(s.getBytes(StandardCharsets.UTF_8))
          case n @ (_: java.lang.Byte | _: java.lang.Short |
                    _: java.lang.Integer | _: java.lang.Long)
              if colIsNumeric =>
            val l = n.asInstanceOf[Number].longValue()
            if (colIsExact || (-TwoP53 <= l && l <= TwoP53)) longForm(l)
            else None
          case d: java.lang.Double if colIsNumeric => fromDouble(d.doubleValue())
          case f: java.lang.Float if colIsNumeric => fromDouble(f.doubleValue())
          case bd: java.math.BigDecimal if colIsNumeric =>
            val whole = bd.stripTrailingZeros.scale <= 0
            val inLong = whole &&
              bd.compareTo(java.math.BigDecimal.valueOf(Long.MinValue)) >= 0 &&
              bd.compareTo(java.math.BigDecimal.valueOf(Long.MaxValue)) <= 0
            if (inLong) {
              val l = bd.setScale(0).longValueExact()
              if (colIsExact || (-TwoP53 <= l && l <= TwoP53)) longForm(l)
              else None
            } else None
          case bd: BigDecimal if colIsNumeric => probeForm(bd.underlying())
          case s: String if colIsNumeric =>
            // string-vs-numeric coerces both sides to DOUBLE
            scala.util.Try(s.trim.toDouble).toOption.flatMap(fromDouble)
          case _ => None
        }
        val castOkFor: DataType => Boolean = target => colType(c).exists(ct =>
          org.apache.spark.sql.catalyst.expressions.Cast.canUpCast(ct, target))
        org.apache.spark.sql.graftbridge.ColumnBridge
          .impliedEqualitySet(predicate, c, castOkFor) match {
          case Some(vals) if vals.nonEmpty =>
            val probes = vals.map(probeForm)
            if (probes.exists(_.isEmpty)) cand // one bad member: no narrowing
            else cand.filter { e =>
              e.bloomFor(c) match {
                case Some(payload) =>
                  val bf = bloomFilterOf(fs, rootP, payload)
                  probes.flatten.exists(bf.mightContainBinary)
                case None => true
              }
            }
          case _ => cand
        }
      }
    recordDiscoveryStats(rootP, table,
      DiscoveryStats(scanSet.size.toLong, mine.size.toLong))
    if (scanSet.isEmpty) return (0L, 0L)
    val df = spark.read.parquet(
      scanSet.map(e => new HPath(rootP, e.relPath).toString): _*)
    val affectedFiles = df.filter(delCond)
      .select(input_file_name().as("f")).distinct()
      .collect().map(_.getString(0)).toSet
    if (affectedFiles.isEmpty) return (0L, 0L)
    val (aff, keep) = partitionAffected(rootP, mine, affectedFiles)
    val adf = spark.read.parquet(aff.map(e => new HPath(rootP, e.relPath).toString): _*)
    val keepRows = adf.filter(!delCond)
    // a fully-emptied table still commits one footer-only file so the
    // next read keeps its schema (the deleteWhere readability contract)
    val newEntries = writeDataNonEmptyOr(spark, rootP, fs, table, keepRows,
      statsCol, bloomCol, keepSchemaIfEmpty = keep.isEmpty, extraBloomCols,
      extraStatsCols)
    // deleted-row count by manifest arithmetic — affected footer rows
    // minus the survivor rows the rewrite just recorded — instead of a
    // separate filter-count pass over the affected files; only pre-v2
    // entries without footer counts pay the scan
    val affRows = aff.flatMap(_.rows)
    val nDel =
      if (affRows.size == aff.size) affRows.sum - writtenRows(newEntries)
      else adf.filter(delCond).count()
    writeCommit(fs, rootP, cur.version + 1L,
      cur.entries.filterNot(e => e.table == table) ++ keep ++ newEntries,
      parent = Some(cur.entries))
    (aff.size.toLong, nDel)
  }

  /** Last merge-discovery pruning outcome per (root, table): how many of
    * the table's files the discovery scan actually read vs held — the
    * observability hook for [[affectedByKeys]]'s candidate narrowing.
    * Keyed by table too: merges on DIFFERENT tables under one root (the
    * CorpusIngest corpus+index shape) must not overwrite each other's
    * counts. The table-less accessor returns the root's most recent
    * record (whatever table it was for) — the pre-r17 reading. */
  final case class DiscoveryStats(scannedFiles: Long, totalFiles: Long)
  private val discoveryStatsRegistry =
    new java.util.concurrent.ConcurrentHashMap[(String, String), DiscoveryStats]()
  private val discoveryStatsLastTable =
    new java.util.concurrent.ConcurrentHashMap[String, String]()
  private def recordDiscoveryStats(rootP: HPath, table: String,
                                   st: DiscoveryStats): Unit = {
    val p = rootP.toUri.getPath
    discoveryStatsRegistry.put((p, table), st)
    discoveryStatsLastTable.put(p, table)
  }
  def mergeDiscoveryStats(root: String, table: String): Option[DiscoveryStats] =
    Option(discoveryStatsRegistry.get(
      (new HPath(root).toUri.getPath, table)))
  def mergeDiscoveryStats(root: String): Option[DiscoveryStats] = {
    val p = new HPath(root).toUri.getPath
    Option(discoveryStatsLastTable.get(p))
      .flatMap(t => Option(discoveryStatsRegistry.get((p, t))))
  }

  /** Driver-side cap on collected probe keys for exact per-file
    * candidate tests; past it discovery falls back to the range
    * envelope (still sound, coarser). A var ONLY so specs can drive
    * the overflow path without a 100k-row fixture; production never
    * writes it. */
  private[graft] var MaxCollectedProbeKeys = 100000L

  /** Driver budget for bloom-probe work (files-with-bloom × probe
    * forms); past it the bloom narrowing is skipped, never partial —
    * probing a SUBSET of keys would be a false negative. */
  private val MaxBloomProbeWork = 50000000L

  /** The candidate files a merge's probe keys could possibly live in —
    * discovery narrowing so the per-batch semi-join scan reads
    * O(candidates), not O(table). Sound by construction (a skipped
    * file provably contains NO probe key):
    *   - manifest min/max on a key column — applied only when the
    *     file's RECORDED stats name matches the column (pre-v2 unnamed
    *     stats trust the caller's declared column, the only information
    *     there is): exact per-file containment against the collected
    *     probe-key set when it is bounded (a sorted-array binary search
    *     per file), the coarse [batchMin,batchMax] envelope past
    *     [[MaxCollectedProbeKeys]];
    *   - per-file Bloom filters on the column (write-time or
    *     [[indexBloom]]-retrofitted, primary or secondary slot): a
    *     range-surviving file whose filter rejects every probe key is
    *     skipped — the narrowing that survives insert-heavy batches,
    *     whose fresh keys blow any range envelope. No false negatives,
    *     so never lossy.
    * Files without stats/bloom on a column are always candidates for
    * that column. MULTI-COLUMN keys narrow per column and intersect:
    * per-column containment is NECESSARY for tuple containment, so a
    * file rejected on any one covered column cannot hold a probe tuple
    * — composite-key merges narrow on whichever columns have coverage.
    * At 100 TB this is the difference between a CDC batch scanning the
    * table and scanning the handful of files its keys cluster into. */
  /** May file-skipping metadata computed over a TABLE column of type
    * `tableT` be probed with values of type `probeT`? Sound cases only:
    *  - identical types: the equality the consumer re-applies (semi
    *    join / predicate) is same-type, so the canonical string/long
    *    cast forms both sides go through are the same function of the
    *    same values — a match implies a probe-form hit;
    *  - both EXACT numeric (integral/decimal): Spark widens both sides
    *    to an exact numeric type, a match means exact numeric equality,
    *    and the LONG-cast form is then a function of the shared value —
    *    both stats (long min/max) and blooms (long-form insertion) see
    *    every matching row, at any magnitude;
    *  - both FLOATING (float/double): float→double widening is exact,
    *    so matching values share one double, whose truncation both
    *    sides' long casts compute identically.
    * A MIXED exact/floating pair must NOT narrow: the comparison widens
    * to DOUBLE, and above 2^53 many distinct longs satisfy equality
    * with one double — the probe's single long-cast rendering would
    * miss the matching rows' renderings (a bloom/stats false negative,
    * i.e. a silently lost merge/delete on snowflake-scale ids). Nor may
    * anything else — above all STRING columns compared against
    * numerics, where Spark coerces to DOUBLE and a decimal-formatted
    * string like "4.00" long-casts to NULL (invisible to stats) while
    * its raw form never matches a numeric probe's rendering. */
  private def narrowTypesAlign(tableT: org.apache.spark.sql.types.DataType,
                               probeT: org.apache.spark.sql.types.DataType): Boolean = {
    import org.apache.spark.sql.types._
    def exactNum(dt: DataType): Boolean = dt match {
      case ByteType | ShortType | IntegerType | LongType => true
      case _: DecimalType => true
      case _ => false
    }
    def floatNum(dt: DataType): Boolean =
      dt == FloatType || dt == DoubleType
    tableT == probeT ||
      (exactNum(tableT) && exactNum(probeT)) ||
      (floatNum(tableT) && floatNum(probeT))
  }

  private def discoveryCandidates(spark: SparkSession, rootP: HPath,
                                  probeKeys: DataFrame, key: Seq[String],
                                  statsCol: Option[String],
                                  mine: Seq[FileEntry],
                                  tableSchema: org.apache.spark.sql.types.StructType): Seq[FileEntry] = {
    // a handful of files is cheaper to scan than to narrow (the probe
    // collection is a Spark job); narrowing exists for tables where the
    // file LIST is the cost
    if (mine.size <= 4) return mine
    key.foldLeft(mine) { (cand, kc) =>
      val aligned = (tableSchema.find(_.name == kc),
        probeKeys.schema.find(_.name == kc)) match {
        case (Some(t), Some(p)) => narrowTypesAlign(t.dataType, p.dataType)
        case _ => false
      }
      if (cand.size <= 4 || !aligned) cand
      else narrowByColumn(spark, rootP, probeKeys, kc, statsCol, cand)
    }
  }

  /** One key column's narrowing pass over `cand` (see
    * [[discoveryCandidates]]): range containment via
    * [[FileEntry.statsFor]], then bloom probes via
    * [[FileEntry.bloomFor]] under the driver budget. Probe keys render
    * through the same canonical forms the writers inserted
    * ([[canonLongExpr]]/[[bloomLongFormExpr]] — epoch-day for DATE keys,
    * whose plain long cast is an analysis error). */
  private def narrowByColumn(spark: SparkSession, rootP: HPath,
                             probeKeys: DataFrame,
                             kc: String, statsCol: Option[String],
                             cand: Seq[FileEntry]): Seq[FileEntry] = {
    val fs = rootP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val statsCover = cand.exists(_.statsFor(kc, statsCol).isDefined)
    val bloomsPresent = cand.exists(_.bloomFor(kc).isDefined)
    if (!statsCover && !bloomsPresent) return cand
    val probeDt = probeKeys.schema.find(_.name == kc).map(_.dataType)
    // ONE extra job in the common case: collect up to the cap + 1
    // distinct keys — an overflowing take proves the set is unbounded
    // and discovery falls back to the envelope aggregate
    val taken = probeKeys.select(canonLongExpr(kc, probeDt).as("l"),
        col(kc).cast("string").as("s")).distinct()
      .limit(MaxCollectedProbeKeys.toInt + 1).collect()
    val collected: Option[Array[Row]] =
      if (taken.length <= MaxCollectedProbeKeys) Some(taken) else None
    val ranged =
      if (!statsCover) cand
      else collected match {
        case Some(rows) =>
          // exact per-file containment against the sorted key set
          val longs = rows.filter(!_.isNullAt(0)).map(_.getLong(0)).sorted
          val anyUncastable = rows.exists(_.isNullAt(0))
          cand.filter(e => e.statsFor(kc, statsCol) match {
            case Some((mn, mx)) if !anyUncastable =>
              val i = java.util.Arrays.binarySearch(longs, mn)
              val from = if (i >= 0) i else -i - 1
              from < longs.length && longs(from) <= mx
            case _ => true // footer-only / uncastable keys: never skip
          })
        case None =>
          // overflow path: same uncastable discipline as the collected
          // branch — a probe key the long cast loses (non-numeric
          // string key) contributes nothing to min/max, and an envelope
          // built without it could skip the very file that joins it;
          // one aggregate answers both questions
          val cl = canonLongExpr(kc, probeDt)
          val r = probeKeys.agg(min(cl), max(cl),
            sum(when(col(kc).isNotNull && cl.isNull,
              lit(1L)).otherwise(lit(0L)))).head()
          val anyUncastable = !r.isNullAt(2) && r.getLong(2) > 0L
          if (r.isNullAt(0) || r.isNullAt(1) || anyUncastable) cand
          else cand.filter(e => e.statsFor(kc, statsCol) match {
            case Some((mn, mx)) => mx >= r.getLong(0) && mn <= r.getLong(1)
            case None => true
          })
      }
    val bloomable = ranged.count(_.bloomFor(kc).isDefined)
    collected match {
      // driver budget: each skippable file pays up to |probes| filter
      // tests — past the budget the bloom pass would stall the driver,
      // so it is skipped (sound: skipping the NARROWING keeps files)
      case Some(rows) if bloomable > 0 &&
          bloomable.toLong * rows.length * 2 <= MaxBloomProbeWork =>
        // probe BOTH canonical forms, mirroring statsBloomPass's double
        // insertion: a probe key arriving type-coerced (DOUBLE source
        // against a LONG table renders "4.0") must still hit the
        // long-form entry — a single-form probe is a guaranteed false
        // negative there, i.e. a silently never-rewritten matched row
        val probes = rows.flatMap { r =>
          val s = if (r.isNullAt(1)) None
            else Some(r.getString(1).getBytes(StandardCharsets.UTF_8))
          val l = if (r.isNullAt(0)) None
            else Some(String.valueOf(r.getLong(0))
              .getBytes(StandardCharsets.UTF_8))
          (s.toSeq ++ l.filterNot(lb => s.exists(java.util.Arrays.equals(_, lb))))
        }
        ranged.filter { e =>
          e.bloomFor(kc) match {
            case Some(payload) =>
              val bf = bloomFilterOf(fs, rootP, payload)
              probes.exists(bf.mightContainBinary)
            case None => true
          }
        }
      case _ => ranged
    }
  }

  /** Partition a table's manifest entries into (filesContainingAnyKey,
    * untouchedFiles) — the copy-on-write affected-set discovery shared
    * by [[mergeInto]] and [[transactionalMerge]]. The semi-join scan
    * reads only [[discoveryCandidates]] (manifest-stats + bloom
    * narrowed); files outside the candidate set are untouched by
    * construction. `input_file_name()` is attached SCAN-SIDE (a
    * projection below the join): evaluated above a non-broadcast join
    * it returns the empty string — with a sort-merge-joined probe side
    * every file would silently look unaffected and matched rows would
    * never be rewritten. The fail-loud guard rejects an empty file
    * name if a plan change ever reintroduces that. */
  private def affectedByKeys(spark: SparkSession, rootP: HPath,
                             probeKeys: DataFrame,
                             key: Seq[String], statsCol: Option[String],
                             mine: Seq[FileEntry],
                             tableSchema: org.apache.spark.sql.types.StructType): (Seq[FileEntry], Seq[FileEntry]) = {
    val cand = discoveryCandidates(spark, rootP, probeKeys, key, statsCol,
      mine, tableSchema)
    recordDiscoveryStats(rootP, mine.headOption.fold("")(_.table),
      DiscoveryStats(cand.size.toLong, mine.size.toLong))
    if (cand.isEmpty) return (Nil, mine)
    val cdf = spark.read.parquet(
      cand.map(e => new HPath(rootP, e.relPath).toString): _*)
    val affectedFiles = cdf.withColumn("__f", input_file_name())
      .join(probeKeys, key, "left_semi")
      .select(col("__f")).distinct()
      .collect().map(_.getString(0)).toSet
    require(!affectedFiles.contains(""),
      "affectedByKeys: input_file_name evaluated above the join " +
        "(empty file name) — affected-file discovery would be corrupt")
    val (aff, keepCand) = partitionAffected(rootP, cand, affectedFiles)
    val candSet = cand.map(_.relPath).toSet
    (aff, keepCand ++ mine.filterNot(e => candSet.contains(e.relPath)))
  }

  /** O(A+M) affected/untouched split of manifest entries against a
    * collected set of `input_file_name()` strings. Both sides normalize
    * to the DECODED URI path component (`Path.toUri.getPath` strips
    * scheme/authority and percent-encoding), so `file:/x` vs `file:///x`
    * vs encoded forms all meet in one HashSet probe — the previous
    * per-entry `exists(_.endsWith(relPath))` scan was O(A×M) pure
    * driver CPU, quadratic in table size on the per-micro-batch CDC
    * merge path. Fail-loud: every collected file was read FROM this
    * entry list, so each must normalize onto exactly one entry — a
    * count mismatch means the normalization lost a file and a matched
    * row would silently never be rewritten. */
  private def partitionAffected(rootP: HPath, mine: Seq[FileEntry],
                                affectedFiles: Set[String])
      : (Seq[FileEntry], Seq[FileEntry]) = {
    // input_file_name() returns the URL-ENCODED URI string (Spark's
    // PartitionedFile path form): parse as URI so "%20" decodes to the
    // space the manifest side (Hadoop Path semantics) carries raw — a
    // Path round-trip would keep the literal "%20" and every merge on a
    // space-containing root would abort on the count tripwire below
    def normalizeScan(f: String): String =
      try {
        val p = new java.net.URI(f).getPath
        if (p != null && p.nonEmpty) p else new HPath(f).toUri.getPath
      } catch {
        case _: java.net.URISyntaxException => new HPath(f).toUri.getPath
      }
    val affectedNorm: Set[String] = affectedFiles.map(normalizeScan)
    val split = mine.partition(e =>
      affectedNorm.contains(new HPath(rootP, e.relPath).toUri.getPath))
    require(split._1.size == affectedFiles.size,
      s"partitionAffected: ${affectedFiles.size} affected files matched " +
        s"only ${split._1.size} manifest entries — path normalization " +
        "lost a file; refusing to merge with a corrupt affected set")
    split
  }

  /** The copy-on-write rewrite core shared by [[mergeInto]] and
    * [[transactionalMerge]] (one body, so a fix to the anti-join /
    * footer-only rule can never apply to one merge path and not the
    * other): rows of the AFFECTED files whose key matches a
    * `touchedKeys` row are dropped, `inserts` rows (if any) are
    * appended, and the result is written under the
    * [[writeDataNonEmptyOr]] discipline. `inserts = None` is a pure
    * delete-shaped rewrite (its columns may not match the table's —
    * the transactionalMerge empty-upserts contract). */
  private def rewriteAffected(spark: SparkSession, rootP: HPath,
                              fs: FileSystem, table: String,
                              aff: Seq[FileEntry], touchedKeys: DataFrame,
                              key: Seq[String], inserts: Option[DataFrame],
                              keepSchemaIfEmpty: Boolean,
                              statsCol: Option[String],
                              bloomCol: Option[String],
                              extraBloomCols: Seq[String] = Nil,
                              extraStatsCols: Seq[String] = Nil): Seq[FileEntry] = {
    val keepRows =
      if (aff.isEmpty) touchedKeys.where(lit(false)) // only with inserts
      else spark.read.parquet(
        aff.map(e => new HPath(rootP, e.relPath).toString): _*)
        .join(touchedKeys, key, "left_anti")
    val newRows = inserts match {
      case None => keepRows
      case Some(ins) =>
        if (aff.isEmpty) ins
        else keepRows.select(ins.columns.map(col): _*).unionByName(ins)
    }
    writeDataNonEmptyOr(spark, rootP, fs, table, newRows, statsCol,
      bloomCol, keepSchemaIfEmpty, extraBloomCols, extraStatsCols)
  }

  /** Targeted deletion by KEY SET — the right-to-be-forgotten fast
    * path: where [[deleteWhere]] must scan the whole table to find
    * files matching an arbitrary predicate, a key-set delete goes
    * through [[discoveryCandidates]] (manifest min/max + per-file key
    * blooms), so discovery reads O(candidate files) and the rewrite
    * touches only files that actually contain a forgotten key. One
    * atomic commit; pre-delete versions stay readable until retention
    * drops them (the audit trail). Rebase-on-conflict like the rest of
    * the merge family. Returns (filesRewritten, rowsDeleted). */
  def deleteByKeys(spark: SparkSession, root: String, table: String,
                   keys: DataFrame, key: Seq[String],
                   statsCol: Option[String] = None,
                   bloomCol: Option[String] = None,
                   maxRetries: Int = 3,
                   extraBloomCols: Seq[String] = Nil,
                   extraStatsCols: Seq[String] = Nil): (Long, Long) = {
    require(key.nonEmpty, "deleteByKeys: empty key")
    retryOnConflict(maxRetries) {
      deleteByKeysOnce(spark, root, table, keys, key, statsCol, bloomCol,
        extraBloomCols, extraStatsCols)
    }
  }

  private def deleteByKeysOnce(spark: SparkSession, root: String,
                               table: String, keys: DataFrame,
                               key: Seq[String], statsCol: Option[String],
                               bloomCol: Option[String],
                               extraBloomCols: Seq[String],
                               extraStatsCols: Seq[String]): (Long, Long) = {
    val (fs, rootP) = fsFor(spark, root)
    val cur = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(cur), table)
    require(mine.nonEmpty, s"no table '$table' under $root")
    // cut: the key set feeds discovery, the row count, and the rewrite
    val ks = graft.operators.Lineage.cut(
      keys.select(key.map(col): _*).distinct())
    val (aff, keep) = affectedByKeys(spark, rootP, ks, key, statsCol, mine,
      toDf(spark, rootP, cur.entries, table).schema)
    if (aff.isEmpty) return (0L, 0L)
    val newEntries = rewriteAffected(spark, rootP, fs, table, aff, ks,
      key, inserts = None, keepSchemaIfEmpty = keep.isEmpty, statsCol,
      bloomCol, extraBloomCols, extraStatsCols)
    // deleted-row count by manifest arithmetic — affected footer rows
    // minus survivor rows the rewrite just recorded — instead of a
    // separate semi-join count pass over the affected files; only
    // pre-v2 entries without footer counts pay the scan
    val affRows = aff.flatMap(_.rows)
    val nDel =
      if (affRows.size == aff.size) affRows.sum - writtenRows(newEntries)
      else spark.read.parquet(
          aff.map(e => new HPath(rootP, e.relPath).toString): _*)
        .join(ks, key, "left_semi").count()
    commitOrRebase(spark, fs, rootP, root, Some(cur),
      carriedOf = _.filterNot(_.table == table),
      added = keep ++ newEntries,
      reusableUnder = tableUnchanged(Some(cur), table),
      freshEntries = newEntries)
    (aff.size.toLong, nDel)
  }

  /** REPLACE-BY-KEY at file granularity for MULTI-ROW keys: every
    * existing row whose key matches a `newRows` key OR a `dropKeys` key
    * is dropped, `newRows` appends, all in ONE atomic commit — the
    * "overwrite these keys' row-SETS" primitive ([[mergeInto]] cannot
    * express it: its replace is row-for-row, so it rejects duplicate
    * source keys, while a k-NN index repairing the edge LISTS of
    * affected sources has `degree` rows per key on both sides).
    * Discovery narrows through [[discoveryCandidates]] (per-file key
    * stats + blooms), so only files actually holding a touched key are
    * rewritten; everything else carries byte-identical. Rebase-on-
    * conflict like the rest of the merge family. Returns
    * (filesRewritten, rowsDropped). */
  def replaceByKeys(spark: SparkSession, root: String, table: String,
                    newRows: DataFrame, key: Seq[String],
                    dropKeys: DataFrame,
                    statsCol: Option[String] = None,
                    bloomCol: Option[String] = None,
                    maxRetries: Int = 3,
                    extraBloomCols: Seq[String] = Nil,
                    extraStatsCols: Seq[String] = Nil): (Long, Long) = {
    require(key.nonEmpty, "replaceByKeys: empty key")
    retryOnConflict(maxRetries) {
      replaceByKeysOnce(spark, root, table, newRows, key, dropKeys,
        statsCol, bloomCol, extraBloomCols, extraStatsCols)
    }
  }

  private def replaceByKeysOnce(spark: SparkSession, root: String,
                                table: String, newRows: DataFrame,
                                key: Seq[String], dropKeys: DataFrame,
                                statsCol: Option[String],
                                bloomCol: Option[String],
                                extraBloomCols: Seq[String],
                                extraStatsCols: Seq[String]): (Long, Long) = {
    val (fs, rootP) = fsFor(spark, root)
    val cur = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(cur), table)
    require(mine.nonEmpty, s"no table '$table' under $root")
    val df = toDf(spark, rootP, cur.entries, table)
    require(newRows.columns.toSet == df.columns.toSet,
      s"replaceByKeys: newRows columns ${newRows.columns.toSeq} must " +
        s"match table columns ${df.columns.toSeq}")
    require(key.forall(dropKeys.columns.contains),
      s"replaceByKeys: dropKeys must carry the key columns $key " +
        s"(got ${dropKeys.columns.toSeq})")
    // cut: the new rows feed the touched-key set AND the rewrite union
    val nr = graft.operators.Lineage.cut(
      newRows.select(df.columns.map(col): _*))
    val touched = graft.operators.Lineage.cut(
      nr.select(key.map(col): _*)
        .unionByName(dropKeys.select(key.map(col): _*)).distinct())
    val (aff, keep) = affectedByKeys(spark, rootP, touched, key, statsCol,
      mine, df.schema)
    val newEntries = rewriteAffected(spark, rootP, fs, table, aff, touched,
      key, inserts = Some(nr), keepSchemaIfEmpty = keep.isEmpty, statsCol,
      bloomCol, extraBloomCols, extraStatsCols)
    // dropped-row count by manifest arithmetic: the rewrite wrote
    // (affected survivors + nr), so dropped = affected footer rows +
    // |nr| − written rows — |nr| is a count over the already-
    // materialized cut, far cheaper than the former semi-join pass over
    // the affected parquet; pre-v2 entries without footer counts fall
    // back to that pass
    val affRows = aff.flatMap(_.rows)
    val nDropped =
      if (aff.isEmpty) 0L
      else if (affRows.size == aff.size)
        affRows.sum + nr.count() - writtenRows(newEntries)
      else spark.read.parquet(
        aff.map(e => new HPath(rootP, e.relPath).toString): _*)
        .join(touched, key, "left_semi").count()
    commitOrRebase(spark, fs, rootP, root, Some(cur),
      carriedOf = _.filterNot(_.table == table),
      added = keep ++ newEntries,
      reusableUnder = tableUnchanged(Some(cur), table),
      freshEntries = newEntries)
    (aff.size.toLong, nDropped)
  }

  /** MERGE (upsert) by key at FILE granularity — the storage-level
    * sibling of [[graft.operators.ChangeDataCapture.mergeUpsert]] (which
    * merges frames, leaving persistence to the caller): existing rows
    * whose key matches a `source` row are REPLACED by it, unmatched
    * source rows are INSERTED, and only files that actually CONTAIN a
    * matched key are rewritten — every other file carries into the new
    * version byte-identical, not even re-read at commit time (manifest
    * stats bound the affected set for stats-correlated keys). The whole
    * merge is ONE atomic commit; readers of prior versions are
    * untouched. At 100 TB this is the difference between upserting 0.1%
    * of rows and rewriting the table.
    *
    * `source` must carry exactly the table's columns and UNIQUE keys
    * (a duplicate-key source makes "replace" ambiguous — rejected
    * loudly, one aggregation). The source is lineage-cut first: it is
    * read twice (match + write) and a lazy non-deterministic frame
    * could otherwise write rows the match never saw. Returns
    * (filesRewritten, rowsUpdated, rowsInserted). */
  def mergeInto(spark: SparkSession, root: String, table: String,
                source: DataFrame, key: Seq[String],
                statsCol: Option[String] = None,
                bloomCol: Option[String] = None,
                maxRetries: Int = 3,
                extraStatsCols: Seq[String] = Nil): (Long, Long, Long) = {
    retryOnConflict(maxRetries) {
      mergeIntoOnce(spark, root, table, source, key, statsCol, bloomCol,
        extraStatsCols)
    }
  }

  private def mergeIntoOnce(spark: SparkSession, root: String, table: String,
                source: DataFrame, key: Seq[String],
                statsCol: Option[String],
                bloomCol: Option[String],
                extraStatsCols: Seq[String]): (Long, Long, Long) = {
    require(key.nonEmpty, "mergeInto: empty key")
    val (fs, rootP) = fsFor(spark, root)
    val cur = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(cur), table)
    require(mine.nonEmpty, s"no table '$table' under $root")
    val df = toDf(spark, rootP, cur.entries, table)
    require(source.columns.toSet == df.columns.toSet,
      s"mergeInto: source columns ${source.columns.toSeq} must match " +
        s"table columns ${df.columns.toSeq}")
    val src = graft.operators.Lineage.cut(
      source.select(df.columns.map(col): _*))
    // row count and duplicate-key guard in ONE aggregation job (formerly
    // count() + distinct().count() — two passes over the source)
    val (nSrc, nSrcKeys) = {
      val r = src.groupBy(key.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    if (nSrc == 0L) return (0L, 0L, 0L)
    require(nSrcKeys == nSrc,
      "mergeInto: duplicate keys in source make the replace ambiguous")
    val srcKeys = src.select(key.map(col): _*)
    val (aff, keep) = affectedByKeys(spark, rootP, srcKeys, key, statsCol,
      mine, df.schema)
    val (nUpdated, nMatchedKeys) =
      if (aff.isEmpty) (0L, 0L)
      else {
        // one key-pruned pass over the affected files answers both
        // counts (formerly two semi-join count jobs): matched table
        // rows = Σ per-key counts, matched source keys = the group
        // count (source keys are unique by the guard above)
        val adf = spark.read.parquet(
          aff.map(e => new HPath(rootP, e.relPath).toString): _*)
        val r = adf.select(key.map(col): _*)
          .join(srcKeys, key, "left_semi")
          .groupBy(key.map(col): _*).agg(count(lit(1)).as("__c"))
          .agg(coalesce(sum(col("__c")), lit(0L)), count(lit(1))).head()
        (r.getLong(0), r.getLong(1))
      }
    val newEntries = rewriteAffected(spark, rootP, fs, table, aff, srcKeys,
      key, Some(src), keepSchemaIfEmpty = keep.isEmpty, statsCol, bloomCol,
      extraStatsCols = extraStatsCols)
    commitOrRebase(spark, fs, rootP, root, Some(cur),
      carriedOf = _.filterNot(_.table == table),
      added = keep ++ newEntries,
      reusableUnder = tableUnchanged(Some(cur), table),
      freshEntries = newEntries)
    (aff.size.toLong, nUpdated, nSrc - nMatchedKeys)
  }

  /** Small-file compaction: rewrite the table into
    * ceil(bytes/targetFileBytes) files as a NEW version. Readers of the
    * old version are unaffected (old files stay until vacuum) —
    * compaction is a background operation, not an outage. Returns
    * (filesBefore, filesAfter). */
  def compact(spark: SparkSession, root: String, table: String,
              targetFileBytes: Long = 128L * 1024 * 1024,
              statsCol: Option[String] = None,
              bloomCol: Option[String] = None,
              extraBloomCols: Seq[String] = Nil,
              extraStatsCols: Seq[String] = Nil): (Long, Long) = {
    val (fs, rootP) = fsFor(spark, root)
    val cur = current(spark, root).getOrElse(
      throw new IllegalArgumentException(s"no committed table under $root"))
    val mine = entriesOf(Some(cur), table)
    require(mine.nonEmpty, s"no table '$table' under $root")
    val bytes = tableBytes(fs, rootP, mine)
    val nFiles = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes).toInt
    val df = toDf(spark, rootP, cur.entries, table)
    val re = statsCol match {
      // cluster on the stats column so compacted files keep tight
      // min/max ranges (file skipping survives compaction)
      case Some(c) => df.repartitionByRange(nFiles, col(c)).sortWithinPartitions(col(c))
      case None => df.repartition(nFiles)
    }
    // bloom/stats columns so compaction does not STRIP the table's
    // per-file coverage (merge discovery and readPrunedEq/In consume it)
    val newEntries = writeData(spark, rootP, fs, table, re, statsCol,
      bloomCol, extraStatsCols = extraStatsCols,
      extraBloomCols = extraBloomCols)
    writeCommit(fs, rootP, cur.version + 1L,
      cur.entries.filterNot(_.table == table) ++ newEntries,
      parent = Some(cur.entries))
    (mine.size.toLong, newEntries.size.toLong)
  }

  /** Sum of a table's file sizes, from the MANIFEST when the entries
    * carry write-time byte sizes (zero FS calls — the steady state for
    * every v2-written table); only pre-v2 entries without a recorded
    * size pay a getFileStatus RPC, counted on [[fileStatCalls]]. */
  private def tableBytes(fs: FileSystem, rootP: HPath,
                         mine: Seq[FileEntry]): Long =
    mine.map(e => e.bytes.getOrElse {
      fileStatCalls.incrementAndGet()
      fs.getFileStatus(new HPath(rootP, e.relPath)).getLen
    }).sum

  /** Adaptive defrag for streaming maintainers ([[graft.streaming.CdcApply]],
    * [[graft.streaming.CorpusIngest]]): compacts `table` only when its
    * manifest holds at least `minFiles` files AND at least twice the
    * table's post-compaction ideal (ceil(bytes / targetFileBytes)) —
    * without the second test, a table that has grown to legitimately
    * NEED `minFiles` files would cross an absolute threshold forever
    * and every micro-batch would rewrite the whole table. The sizing
    * reads the manifest's write-time byte sizes — a steady-state-large
    * table (≥ minFiles files forever, the normal shape of any big
    * CDC-maintained table) pays ZERO per-file FS stats per micro-batch;
    * only pre-v2 entries fall back to getFileStatus ([[tableBytes]]).
    * A lost compaction commit CAS is swallowed, not retried:
    * maintenance is optional, the next trigger re-fires, and it must
    * never kill a stream whose batch data already committed. Returns
    * Some((filesBefore, filesAfter)) when a compaction ran. */
  def compactIfFragmented(spark: SparkSession, root: String, table: String,
                          minFiles: Int,
                          targetFileBytes: Long = 128L * 1024 * 1024,
                          statsCol: Option[String] = None,
                          bloomCol: Option[String] = None,
                          extraBloomCols: Seq[String] = Nil,
                          extraStatsCols: Seq[String] = Nil): Option[(Long, Long)] = {
    require(minFiles >= 1, "minFiles >= 1")
    val (fs, rootP) = fsFor(spark, root)
    val mine = entriesOf(current(spark, root), table)
    if (mine.size < minFiles) return None
    val bytes = tableBytes(fs, rootP, mine)
    val ideal = math.max(1L, (bytes + targetFileBytes - 1) / targetFileBytes)
    if (mine.size < 2L * ideal) return None // the table NEEDS these files
    try Some(compact(spark, root, table, targetFileBytes, statsCol, bloomCol,
      extraBloomCols, extraStatsCols))
    catch { case _: CommitConflictException => None }
  }

  /** Reserved pseudo-table carrying transaction watermarks inside commit
    * files. Entries under it reference no data file; [[toDf]] filters by
    * table name so readers never see them, and [[vacuum]] only deletes
    * files that EXIST under data dirs, so markers are inert there too. */
  private val TxnTable = "_txn"

  /** Exactly-once append for at-least-once writers (Structured Streaming
    * `foreachBatch`, retried orchestration steps): the commit that adds
    * the batch's data files ALSO records `(writerId, batchId)` as a
    * transaction watermark, so the data and the "already applied" fact
    * become visible in the same atomic commit-file PUT — the idempotence
    * ledger cannot diverge from the data (the failure mode of keeping a
    * separate applied-ids store). A replay of batchId <= the recorded
    * watermark is a no-op returning false.
    *
    * Batch ids must be monotonically increasing per writer (Structured
    * Streaming's contract), so ONE watermark entry per (writer, table)
    * suffices — commit files do not grow with stream lifetime. Unlike
    * [[appendNew]] no key columns are needed: aggregates and other
    * non-keyed outputs get exactly-once too. Empty batches return true
    * without creating a version (re-running them is harmless).
    *
    * The exactly-once guarantee inherits [[writeCommit]]'s exclusion:
    * on HDFS/file: a racing duplicate replay loses the fixed-name
    * rename, re-resolves, sees the watermark, and no-ops; on object
    * stores without exclusive rename it additionally requires the
    * module-level single-writer-or-lock-service deployment contract. */
  def transactionalAppend(spark: SparkSession, root: String, table: String,
                          df: DataFrame, writerId: String, batchId: Long,
                          statsCol: Option[String] = None): Boolean = {
    require(!writerId.contains("\t") && !writerId.contains("\n") &&
      !writerId.contains("/"), s"illegal writerId: $writerId")
    val (fs, rootP) = fsFor(spark, root)
    fs.mkdirs(rootP)
    val cur = current(spark, root)
    val markerPath = s"$writerId/$table"
    val applied = cur.exists(_.entries.exists(e =>
      e.table == TxnTable && e.relPath == markerPath &&
        e.min.exists(_ >= batchId)))
    if (applied) return false
    // write FIRST, count from the written footers, drop the dir when
    // empty — one execution of `df` (the appendNew discipline); the
    // empty batch still returns true without creating a version
    val written = writeData(spark, rootP, fs, table, df, statsCol)
    val writtenDir = new HPath(rootP, written.head.relPath).getParent
    if (writtenRows(written) == 0L) {
      fs.delete(writtenDir, true)
      return true
    }
    val newEntries = written
    val carried = cur.map(_.entries.filterNot(e =>
      e.table == TxnTable && e.relPath == markerPath)).getOrElse(Nil)
    writeCommit(fs, rootP, cur.fold(1L)(_.version + 1L),
      carried ++ newEntries :+
        FileEntry(TxnTable, markerPath, Some(batchId), Some(batchId)),
      parent = cur.map(_.entries))
    true
  }

  /** Has `writerId` already applied `batchId` (to any table) via
    * [[transactionalAppendAll]]? One manifest resolve — the O(1)
    * replay probe for foreachBatch writers, checked BEFORE computing
    * the batch. */
  def batchApplied(spark: SparkSession, root: String, writerId: String,
                   batchId: Long): Boolean =
    current(spark, root).exists(_.entries.exists(e =>
      e.table == TxnTable && e.relPath == s"$writerId/__txn" &&
        e.min.exists(_ >= batchId)))

  /** The per-table twin of [[batchApplied]] for
    * [[transactionalAppend]]/[[transactionalMerge]] writers (their
    * watermark rides `<writerId>/<table>`). */
  def tableBatchApplied(spark: SparkSession, root: String, table: String,
                        writerId: String, batchId: Long): Boolean =
    current(spark, root).exists(_.entries.exists(e =>
      e.table == TxnTable && e.relPath == s"$writerId/$table" &&
        e.min.exists(_ >= batchId)))

  /** Exactly-once CDC apply — [[mergeInto]] plus a delete set plus the
    * `(writerId, batchId)` watermark, all in ONE commit: existing rows
    * matching an upsert key are replaced, rows matching a delete key
    * vanish, unmatched upserts insert, and only files containing a
    * touched key are rewritten (every other file carries
    * byte-identical). A replay of batchId <= the watermark no-ops
    * before reading the batch; a batch that changes nothing writes no
    * version (re-running it is harmless, the [[transactionalAppend]]
    * empty-batch contract). A missing table bootstraps from the
    * upserts, so a CDC stream needs no separate initialization step.
    * Upsert keys must be unique within the batch (collapse the change
    * log first — [[graft.operators.ChangeDataCapture.applyChangeLog]]).
    * Returns false iff the batch was already applied. */
  def transactionalMerge(spark: SparkSession, root: String, table: String,
                         upserts: DataFrame, deleteKeys: DataFrame,
                         key: Seq[String], writerId: String, batchId: Long,
                         statsCol: Option[String] = None,
                         fkChecks: Seq[(String, Seq[String], String, Seq[String])] = Nil,
                         bloomCol: Option[String] = None,
                         maxRetries: Int = 3,
                         extraStatsCols: Seq[String] = Nil): Boolean = {
    retryOnConflict(maxRetries) {
      transactionalMergeOnce(spark, root, table, upserts, deleteKeys, key,
        writerId, batchId, statsCol, fkChecks, bloomCol, extraStatsCols)
    }
  }

  private def transactionalMergeOnce(spark: SparkSession, root: String,
                         table: String,
                         upserts: DataFrame, deleteKeys: DataFrame,
                         key: Seq[String], writerId: String, batchId: Long,
                         statsCol: Option[String],
                         fkChecks: Seq[(String, Seq[String], String, Seq[String])],
                         bloomCol: Option[String],
                         extraStatsCols: Seq[String]): Boolean = {
    require(key.nonEmpty, "transactionalMerge: empty key")
    require(!writerId.contains("\t") && !writerId.contains("\n") &&
      !writerId.contains("/"), s"illegal writerId: $writerId")
    val (fs, rootP) = fsFor(spark, root)
    fs.mkdirs(rootP)
    val cur = current(spark, root)
    val markerPath = s"$writerId/$table"
    if (cur.exists(_.entries.exists(e =>
      e.table == TxnTable && e.relPath == markerPath &&
        e.min.exists(_ >= batchId)))) return false
    val up = graft.operators.Lineage.cut(upserts)
    // row count and duplicate-key guard in ONE aggregation job (formerly
    // count() + distinct().count() — two passes over the batch)
    val (nUp, nUpKeys) = {
      val r = up.groupBy(key.map(col): _*).agg(count(lit(1)).as("__c"))
        .agg(coalesce(sum(col("__c")), lit(0L)), count(lit(1))).head()
      (r.getLong(0), r.getLong(1))
    }
    require(nUpKeys == nUp,
      "transactionalMerge: duplicate upsert keys — collapse the change " +
        "log first (applyChangeLog)")
    // FK integrity on the INCOMING rows only (batch-proportional — the
    // standing table was checked when it landed): each relation
    // anti-joins the upserts' non-null child keys against the CURRENT
    // parent table under this root; an orphan aborts the batch before
    // any write, the reference's FK-rejecting load semantics on the
    // CDC path. fkChecks = (name, childCols, parentTable, parentCols).
    val fkFailures = fkChecks.flatMap { case (cname, cc, pt, pc) =>
      val child = up.select(cc.map(col): _*).na.drop("any")
      val parent = read(spark, root, pt).select(pc.zip(cc).map {
        case (p, c) => col(p).as(c) }: _*)
      val orphans = child.join(parent, cc, "left_anti").count()
      if (orphans > 0L) Some(s"$cname ($orphans orphaned upserts)") else None
    }
    if (fkFailures.nonEmpty)
      throw new IllegalStateException(
        s"transactionalMerge: FK violations — batch $batchId not " +
          s"applied: ${fkFailures.mkString("; ")}")
    // delete keys resolve BY NAME — a positional mapping would silently
    // mis-key deletes for a caller whose frame orders columns differently
    require(key.forall(deleteKeys.columns.contains),
      s"transactionalMerge: deleteKeys must carry the key columns $key " +
        s"(got ${deleteKeys.columns.toSeq})")
    val del = graft.operators.Lineage.cut(
      deleteKeys.select(key.map(col): _*))
    val exists = cur.exists(_.entries.exists(_.table == table))
    def commit(dropped: Seq[FileEntry], added: Seq[FileEntry]): Boolean = {
      val droppedSet = dropped.toSet
      // reuse bar for the file-reusing rebase: the interleaved commit
      // must have left our table AND every FK parent we validated
      // against exactly as planned — anything else re-runs the attempt
      def reusable(nc: Commit): Boolean =
        tableUnchanged(cur, table)(nc) &&
          fkChecks.forall { case (_, _, pt, _) => tableUnchanged(cur, pt)(nc) }
      commitOrRebase(spark, fs, rootP, root, cur,
        carriedOf = _.filterNot(e => droppedSet.contains(e) ||
          (e.table == TxnTable && e.relPath == markerPath)),
        added = added :+
          FileEntry(TxnTable, markerPath, Some(batchId), Some(batchId)),
        reusableUnder = reusable,
        alreadyAppliedUnder = nc => nc.entries.exists(e =>
          e.table == TxnTable && e.relPath == markerPath &&
            e.min.exists(_ >= batchId)),
        freshEntries = added) match {
        case Committed(_) => true
        case AlreadyApplied => false
      }
    }
    if (!exists) {
      if (nUp == 0L) return true // nothing to create; replay harmless
      return commit(Nil,
        writeData(spark, rootP, fs, table, up, statsCol, bloomCol,
          extraStatsCols = extraStatsCols))
    }
    val mine = entriesOf(cur, table)
    val df = toDf(spark, rootP, cur.get.entries, table)
    require(up.columns.toSet == df.columns.toSet || nUp == 0L,
      s"transactionalMerge: upsert columns ${up.columns.toSeq} must " +
        s"match table columns ${df.columns.toSeq}")
    // cut: touched feeds the discovery collect, the semi-join scan, and
    // the rewrite anti-join — without it each consumer re-runs the
    // distinct shuffle
    val touched = graft.operators.Lineage.cut(
      up.select(key.map(col): _*).unionByName(del).distinct())
    val (aff, keep) = affectedByKeys(spark, rootP, touched, key, statsCol,
      mine, df.schema)
    if (aff.isEmpty && nUp == 0L) return true // no-change batch
    val newEntries = rewriteAffected(spark, rootP, fs, table, aff, touched,
      key, if (nUp == 0L) None else Some(up),
      keepSchemaIfEmpty = keep.isEmpty, statsCol, bloomCol,
      extraStatsCols = extraStatsCols)
    commit(aff, newEntries)
  }

  /** [[transactionalAppend]] for a MULTI-SINK batch: every table's new
    * files and the `(writerId, batchId)` watermark land in ONE commit —
    * the whole batch is a single transaction, so there is no ordering
    * among sinks to crash between and no per-sink idempotence guard to
    * re-derive on replay (the CorpusIngest marker-file design needs a
    * begin/commit pair and an expensive crashed-replay path precisely
    * because its sinks commit separately). A crash before the commit
    * leaves only orphan data files (invisible to readers, reclaimed by
    * [[vacuum]]); the replay recomputes and commits whole.
    *
    * Empty frames: a table whose batch contribution is empty writes one
    * footer-only file ONLY when the table does not exist yet (schema
    * establishment — the deleteWhere readability idiom); otherwise it
    * is carried untouched, so long streams do not accumulate empty
    * files. Returns false iff `batchId` was already applied. */
  def transactionalAppendAll(spark: SparkSession, root: String,
                             tables: Map[String, DataFrame],
                             writerId: String, batchId: Long,
                             statsCols: Map[String, String] = Map.empty,
                             maxRetries: Int = 3,
                             bloomCols: Map[String, String] = Map.empty): Boolean = {
    retryOnConflict(maxRetries) {
      transactionalAppendAllOnce(spark, root, tables, writerId, batchId,
        statsCols, bloomCols)
    }
  }

  private def transactionalAppendAllOnce(spark: SparkSession, root: String,
                             tables: Map[String, DataFrame],
                             writerId: String, batchId: Long,
                             statsCols: Map[String, String],
                             bloomCols: Map[String, String]): Boolean = {
    require(tables.nonEmpty, "transactionalAppendAll: no tables")
    require(!writerId.contains("\t") && !writerId.contains("\n") &&
      !writerId.contains("/"), s"illegal writerId: $writerId")
    val (fs, rootP) = fsFor(spark, root)
    fs.mkdirs(rootP)
    val cur = current(spark, root)
    val markerPath = s"$writerId/__txn"
    val applied = cur.exists(_.entries.exists(e =>
      e.table == TxnTable && e.relPath == markerPath &&
        e.min.exists(_ >= batchId)))
    if (applied) return false
    val newEntries = inParallel(tables.toSeq.sortBy(_._1)) { case (name, df) =>
      val exists = cur.exists(_.entries.exists(_.table == name))
      // one execution + footer-only-if-new: an empty contribution to a
      // brand-new table establishes its schema; to an existing table it
      // contributes nothing (long streams do not accumulate empty files)
      writeDataNonEmptyOr(spark, rootP, fs, name, df, statsCols.get(name),
        bloomCol = bloomCols.get(name), keepSchemaIfEmpty = !exists)
    }.flatten
    // reuse bar: appends drop nothing, so an interleaved commit is only
    // disqualifying when it touched one of OUR tables (it could have
    // established a schema we also establish, or appended rows a keyed
    // consumer of this batch compared against)
    commitOrRebase(spark, fs, rootP, root, cur,
      carriedOf = _.filterNot(e =>
        e.table == TxnTable && e.relPath == markerPath),
      added = newEntries :+
        FileEntry(TxnTable, markerPath, Some(batchId), Some(batchId)),
      reusableUnder = nc => tables.keysIterator.forall(t =>
        tableUnchanged(cur, t)(nc)),
      alreadyAppliedUnder = nc => nc.entries.exists(e =>
        e.table == TxnTable && e.relPath == markerPath &&
          e.min.exists(_ >= batchId)),
      freshEntries = newEntries) match {
      case Committed(_) => true
      case AlreadyApplied => false
    }
  }

  // ----------------------------------------- commit-log compaction / vacuum

  /** Bound the commit log WITHOUT touching data: delete all but the
    * `keepVersions` newest commit files, after first landing a
    * LOAD-BEARING `k-` checkpoint of the oldest kept version so the
    * delta chain under every survivor stays resolvable (commits are
    * deltas now; a retained delta whose base vanished would be
    * unreadable). Dropping old commits loses only time travel to them —
    * the current version, its data files, and every retained version are
    * untouched, so this is safe to run WHILE writers commit and readers
    * plan (unlike [[vacuum]], which deletes data files and needs a quiet
    * window). The periodic hygiene call for long-lived CDC / streaming
    * sinks: without it a per-batch committer accumulates one `_commits`
    * object per batch forever; with it the log stays `keepVersions`-sized
    * (plus one checkpoint) and hint-less resolve (the listing path)
    * stays cheap too. Orphaned DATA files of dropped versions remain
    * until [[vacuum]]. Returns the number of commit files removed. */
  def compactLog(spark: SparkSession, root: String, keepVersions: Int = 1): Long = {
    require(keepVersions >= 1, "compactLog must keep at least the current version")
    val (fs, rootP) = fsFor(spark, root)
    val cd = new HPath(rootP, CommitDir)
    if (!fs.exists(cd)) return 0L
    val commits = fs.listStatus(cd).map(_.getPath.getName)
      .filter(n => CommitName.pattern.matcher(n).matches()).sorted
    val (drop, keep) = commits.splitAt(math.max(0, commits.length - keepVersions))
    if (drop.isEmpty) return 0L
    // delta-chain safety: the oldest KEPT version must stay resolvable
    // after its ancestors vanish, so a LOAD-BEARING `k-` checkpoint of
    // it is written first (idempotent; resolved while the full chain
    // still exists). Only then can every older c-file — and every now
    // obsolete k-file — go.
    keep.headOption.foreach { n =>
      val CommitName(seq) = n
      writeCheckpoint(fs, cd, seq.toLong, resolveEntries(fs, cd, seq.toLong))
      require(fs.exists(new HPath(cd, checkpointName(seq.toLong))),
        s"compactLog: checkpoint for $n did not land; refusing to drop " +
          "its delta chain")
    }
    drop.foreach(n => fs.delete(new HPath(cd, n), false))
    val keptMin = keep.headOption.map { case CommitName(seq) => seq.toLong }
    fs.listStatus(cd).map(_.getPath.getName)
      .filter(_.startsWith("k-"))
      .foreach { kn =>
        val seq = kn.stripPrefix("k-").stripSuffix(".txt").toLong
        if (keptMin.exists(seq < _)) fs.delete(new HPath(cd, kn), false)
      }
    drop.length.toLong
  }

  // ----------------------------------------------------------------- vacuum

  /** Garbage-collect: delete data files not referenced by any of the
    * `keepVersions` most recent commits, then the superseded commit
    * files themselves, then emptied data dirs. The ONLY place data files
    * are ever deleted — and it never touches the current version, so a
    * reader planning from any retained commit stays consistent. Returns
    * the number of files deleted.
    *
    * Do not run vacuum concurrently with an in-flight write: data files
    * of a not-yet-committed version look unreferenced and would be
    * collected (production deployments add an age threshold; here the
    * contract is vacuum-in-a-quiet-window). */
  def vacuum(spark: SparkSession, root: String, keepVersions: Int = 1,
             minAgeMs: Long = 0L): Long = {
    require(keepVersions >= 1, "vacuum must keep at least the current version")
    require(minAgeMs >= 0L, "minAgeMs must be >= 0")
    val (fs, rootP) = fsFor(spark, root)
    val cd = new HPath(rootP, CommitDir)
    if (!fs.exists(cd)) return 0L
    val commits = fs.listStatus(cd).map(_.getPath.getName)
      .filter(n => CommitName.pattern.matcher(n).matches()).sorted
    if (commits.isEmpty) return 0L
    val (drop, keep) = commits.splitAt(math.max(0, commits.length - keepVersions))
    // the in-flight-write guard: a not-yet-committed version's data
    // files look unreferenced; with minAgeMs > 0 anything younger than
    // the horizon survives, so vacuum no longer needs a quiet window —
    // set it beyond the longest plausible write duration. The horizon
    // derives from the STORAGE's own clock (the mtime of a probe file
    // written just now), not the driver's: on object stores / NFS the
    // two can skew, and a driver clock running fast would reclaim an
    // in-flight write's files that storage stamped "younger" than they
    // look from here. With minAgeMs == 0 the caller accepted the
    // quiet-window contract and no probe is paid.
    val horizon =
      (if (minAgeMs == 0L) System.currentTimeMillis()
       else storageNow(fs, cd)) - minAgeMs
    // superseded commits young enough to survive this pass's age guard
    // must keep their DATA too: a retained commit whose files were
    // reclaimed would resolve (entriesAt / version-pinned reads) and
    // then crash mid-scan — worse than the clean "not retained" error
    val (dropNow, dropRetained) =
      if (minAgeMs == 0L) (drop.toSeq, Seq.empty[String])
      else drop.toSeq.partition(n =>
        fs.getFileStatus(new HPath(cd, n)).getModificationTime < horizon)
    // referenced = every data file of a retained version's RESOLVED
    // state PLUS every bloom sidecar its entries point at — sidecars
    // are reclaimed exactly like data files, only when no retained
    // version needs them. Resolution happens BEFORE any deletion, while
    // the full delta chain still exists.
    val retainedNames = (dropRetained ++ keep.toSeq).sorted
    val referenced: Set[String] = retainedNames.flatMap { n =>
      val CommitName(seq) = n
      resolveEntries(fs, cd, seq.toLong).flatMap(e =>
        e.relPath +: (e.bloom.toSeq ++ e.blooms2).map(_._2)
          .filter(_.startsWith(SidecarMark))
          // pack pointers carry a `#offset:len` fragment — the
          // referenced OBJECT is the pack file itself
          .map { p =>
            val q = p.stripPrefix(SidecarMark)
            val i = q.indexOf('#')
            if (i < 0) q else q.substring(0, i)
          })
    }.toSet
    // delta-chain safety before dropping ancestors: checkpoint the
    // oldest RETAINED version (same rule as compactLog)
    if (dropNow.nonEmpty) retainedNames.headOption.foreach { n =>
      val CommitName(seq) = n
      writeCheckpoint(fs, cd, seq.toLong, resolveEntries(fs, cd, seq.toLong))
      require(fs.exists(new HPath(cd, checkpointName(seq.toLong))),
        s"vacuum: checkpoint for $n did not land; refusing to drop " +
          "its delta chain")
    }
    var deleted = 0L
    // data dirs are every top-level entry except _commits
    fs.listStatus(rootP).filter(s => s.isDirectory && s.getPath.getName != CommitDir)
      .foreach { tdir =>
        val it = fs.listFiles(tdir.getPath, true)
        val toDelete = scala.collection.mutable.ListBuffer.empty[HPath]
        while (it.hasNext) {
          val f = it.next()
          val name = f.getPath.getName
          val rel = s"${tdir.getPath.getName}/${f.getPath.getParent.getName}/$name"
          if ((name.endsWith(".parquet") || name.endsWith(".bloom"))
              && !referenced.contains(rel)
              && (minAgeMs == 0L || f.getModificationTime < horizon)) {
            toDelete += f.getPath
            if (name.endsWith(".bloom"))
              bloomSidecarCache.remove(fs.makeQualified(f.getPath).toString)
          }
        }
        toDelete.foreach { p => fs.delete(p, false); deleted += 1 }
        // prune emptied d-<uuid> / _blooms dirs (and Spark's _SUCCESS
        // markers)
        fs.listStatus(tdir.getPath).filter(_.isDirectory).foreach { d =>
          val kids = fs.listStatus(d.getPath)
          if (kids.forall(k => !k.getPath.getName.endsWith(".parquet") &&
              !k.getPath.getName.endsWith(".bloom")))
            fs.delete(d.getPath, true)
        }
      }
    // superseded commit files get the same age guard (computed above,
    // data kept in step): a reader that planned from an old version
    // moments ago may still be streaming its file list; a young
    // superseded commit AND its data survive until the next pass
    dropNow.foreach(n => fs.delete(new HPath(cd, n), false))
    // k-files older than the oldest surviving commit serve nothing
    val survivorMin = retainedNames.headOption
      .map { case CommitName(seq) => seq.toLong }
    fs.listStatus(cd).map(_.getPath.getName).filter(_.startsWith("k-"))
      .foreach { kn =>
        val seq = kn.stripPrefix("k-").stripSuffix(".txt").toLong
        if (survivorMin.exists(seq < _)) fs.delete(new HPath(cd, kn), false)
      }
    deleted
  }

  /** The storage system's notion of "now": the mtime it stamps on a
    * probe file written this instant — immune to driver/storage clock
    * skew, one tiny PUT+HEAD+DELETE. The probe lives in `_commits`
    * under a dotted name every commit-file matcher ignores. */
  private def storageNow(fs: FileSystem, commitDir: HPath): Long = {
    val probe = new HPath(commitDir, s".vacuum-probe-${uuid()}")
    fs.create(probe, true).close()
    try fs.getFileStatus(probe).getModificationTime
    finally fs.delete(probe, false)
  }
}
