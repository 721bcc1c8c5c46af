package graft.streaming

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.sketch.BloomFilter

import graft.functions.SketchExpressions

/** PER-PARTITION Bloom sidecars for a partitioned side store — the scale
  * fix for stores that can never retention-prune ([[IngestGuard]]'s
  * corpus-lifetime fingerprint store and near-dup band store). A single
  * driver-held filter sized up front has two 100 TB failure modes: at
  * ~1e11 members a 1%-fpp filter is ~120 GB (infeasible to hold or
  * ship), and a filter that silently SATURATES degrades to all-positive —
  * every batch then pays the full pruned read, with no error anywhere.
  * Sharding by the store's own partition key fixes both structurally:
  * each shard is sized to ITS slice, only the batch's own touched
  * partitions are ever loaded, and saturation is detected per shard from
  * its tracked `n_items` and repaired by rebuilding THAT shard from ITS
  * store partition at a covering capacity — a one-partition read, never
  * a corpus scan.
  *
  * ROUND-14 IO GEOMETRY — every per-batch sidecar cost proportional to
  * the BATCH, with base rewrites amortized against delta volume:
  *
  *  - **Driver cache across batches** ([[Cache]]): the store is
  *    single-writer (one foreachBatch owns it), so the in-memory shard
  *    map is authoritative for the query run. Disk is read only on a
  *    run's FIRST touch of a partition; every later batch probes and
  *    folds purely in memory. The cache itself is LRU-bounded
  *    (`maxBytes`) — an unbounded cache would eventually hold the whole
  *    corpus filter, the infeasibility the sharding exists to avoid —
  *    and eviction is always safe because every cached hash is on disk
  *    as a base or delta by the end of [[update]].
  *  - **Per-part BASE FILES + a DELTA LOG**, all driver-native binary IO
  *    (no Spark jobs, no parquet in the hot path): `base/p<N>` holds one
  *    part's serialized filter, replaced atomically (tmp + overwriting
  *    rename) and ONLY when that part's pending delta bytes exceed a
  *    quarter of its filter size — so base write amplification is
  *    bounded at ~4× the delta volume, instead of a cadence rewrite of
  *    corpus-sized state. `delta/d<batchId>` holds one batch's accepted
  *    hashes packed per part — bytes proportional to the batch; a
  *    replayed batch atomically overwrites its own file (idempotent).
  *    An earlier design kept one parquet append-log and compacted it
  *    every 8 batches — that rewrite is O(all bases) every cadence,
  *    which at the 1e10-fp design point is ~200× the delta volume;
  *    the split layout deletes the wholesale rewrite entirely.
  *  - **Loads fold base + newer deltas**: a partition's current filter
  *    is its own-lineage base file with every delta section newer than
  *    the base's `coversThrough` folded in (folding an already-covered
  *    delta is idempotent — re-setting bits). A partition with deltas
  *    but NO base is treated as absent and rebuilt from the store:
  *    deltas alone cover only the hashes appended since they began, and
  *    trusting them would be a false negative — the one failure
  *    correctness can't absorb. Every base written at batch b covers
  *    ≤ b (rebuilds read the store, which holds every completed append;
  *    refreshes serialize the cache, which holds everything folded).
  *  - **Delta truncation**: past a file-count bound the delta log is
  *    merged to the sections no base covers yet, STREAMED one section
  *    at a time (driver memory bounded by one section — one batch's
  *    per-part hashes — not the uncovered volume) into a FRESH file
  *    name (crash-safe: the merged file renames in before the olds
  *    delete, and because the name never collides with a leftover
  *    merge, a replayed truncation can never delete the only copy of
  *    sections that survive solely in that leftover — re-folding a
  *    leftover is idempotent and duplicate sections merge once).
  *    Foreign-lineage sections drop (they can never serve a load).
  *  - **Byte budget** ([[prepare]]'s `maxLoadBytes`): each batch loads
  *    AT MOST this many bytes of uncached shards (own-lineage base
  *    files at their exact listed length plus the pending delta bytes
  *    the load folds; cap0-filter estimates for parts with no usable
  *    base) and DEFERS the rest — deferred parts are reported to the
  *    caller, which treats their rows as bloom-POSITIVE (exact: the
  *    confirm read decides; a false negative is impossible). The cache
  *    persists across batches, so a restarted full-touch stream warms
  *    fully in ~⌈totalBytes/budget⌉ batches instead of skipping the
  *    gate forever. Delta files are still written for deferred parts,
  *    so deferral never starves the sidecar into false negatives.
  *
  * There is NO filter merge anywhere (delta folds are `putLong`), so a
  * restart under a different `fpp` can never throw
  * IncompatibleMergeException: a loaded filter keeps serving at its own
  * geometry and only a REBUILD adopts the new fpp. Capacities evolve
  * PER SHARD.
  *
  * Lineage scoping: batch ids are checkpoint-scoped, so trusting another
  * lineage's rows ordered by batch id could let a stale shard shadow a
  * newer one after a fresh-checkpoint adoption — and a stale Bloom has
  * FALSE NEGATIVES. Base and delta headers carry the lineage; foreign
  * files are never folded, and an adopted store's live partitions
  * rebuild on first touch. (The pre-round-14 sidecar format — one
  * root-level parquet log of full-filter rows — and its read fallback
  * were deleted in round 16 after the documented one-cycle coexistence;
  * a part with no base file takes the count+rebuild path.)
  *
  * `n_items` is an UPPER estimate (a replayed batch re-folds its items),
  * so over-counting only triggers an EARLY rebuild — which resets it
  * from the store's actual row count.
  *
  * Single-writer per store, like every side store here (call from the
  * owning foreachBatch only). */
object BloomShards {

  /** One shard: geometry + the live filter. */
  final case class Shard(capacity: Long, nItems: Long, bloom: BloomFilter)

  /** Driver-side cross-batch shard cache for ONE store under ONE
    * lineage — create once per started query, next to its
    * [[Streams.SideStore]]. `dirty` tracks shards holding hashes not yet
    * covered by a persisted base; `pendingHashes` counts them (the base
    * refresh threshold); `needBase` marks shards rebuilt this batch whose
    * base must persist so later restarts don't re-pay the rebuild. */
  final class Cache(private[streaming] val maxBytes: Long = 8L << 30) {
    private[streaming] val shards =
      scala.collection.mutable.HashMap.empty[Int, Shard]
    private[streaming] val dirty = scala.collection.mutable.Set.empty[Int]
    private[streaming] val needBase = scala.collection.mutable.Set.empty[Int]
    private[streaming] val pendingHashes =
      scala.collection.mutable.HashMap.empty[Int, Long]
    private[streaming] val lastTouch =
      scala.collection.mutable.HashMap.empty[Int, Long]
    private[streaming] var clock = 0L
    /** Observability + spec surface: the byte estimate of what the last
      * [[prepare]] actually loaded (always ≤ its `maxLoadBytes`). */
    var lastLoadBytes: Long = 0L
    /** Observability + spec surface: how many touched live parts the
      * last [[prepare]]'s budget DEFERRED. A converging warm-up drives
      * this to 0 within ⌈bytes/budget⌉ batches; a corpus whose filters
      * exceed the cache budget never does (see [[lastWarming]]). */
    var lastDeferredCount: Int = 0

    private[streaming] def touch(p: Int): Unit = {
      clock += 1
      lastTouch(p) = clock
    }

    /** Observability: parts currently held / their filter bytes. */
    def heldParts: Int = shards.size
    def heldBytes: Long =
      shards.valuesIterator.map(_.bloom.bitSize() / 8).sum

    /** Evict least-recently-touched shards until the held filter bytes
      * fit `maxBytes`. `needBase` shards are pinned (their rebuilt
      * contents are not on disk yet — evicting one would re-pay the
      * store rebuild on next touch for no memory win that batch). */
    private[streaming] def evictToBudget(): Unit = {
      def held = heldBytes
      if (held <= maxBytes) return
      val evictable = shards.keysIterator
        .filterNot(needBase.contains).toIndexedSeq
        .sortBy(p => lastTouch.getOrElse(p, 0L))
      var over = held - maxBytes
      evictable.iterator.takeWhile(_ => over > 0).foreach { p =>
        over -= shards(p).bloom.bitSize() / 8
        shards.remove(p)
        dirty.remove(p)
        pendingHashes.remove(p)
        lastTouch.remove(p)
      }
    }
  }

  /** [[prepare]]'s result: the touched parts' shards (empty when the
    * store has nothing for them), and the touched LIVE parts the byte
    * budget DEFERRED this batch — their sidecars were not loaded, so
    * the caller must treat their rows as bloom-positive (exact; never a
    * false negative) until a later batch's warming loads them. */
  final case class Prepared(shards: Map[Int, Shard], deferred: Seq[Int])

  /** Per-store snapshot of the last [[prepare]]'s warming work — the
    * dashboard hook that tells a CONVERGING warm-up apart from a
    * PERMANENT working-set steady state, which are indistinguishable in
    * per-batch behavior alone (r15 verdict): after a restart,
    * `deferredParts` shrinking to 0 batch over batch is a warm-up
    * completing; a corpus whose live filters exceed the cache budget
    * instead shows `deferredParts` never reaching 0 with `loadedBytes`
    * pinned near the per-batch budget forever — exact either way (the
    * deferred-positive gate guarantees it), but the second is a
    * permanent per-batch reload cost that should be SIZED away (grow
    * [[Cache]]`.maxBytes` to cover the live working set, or shrink the
    * touched set per batch). `loadedParts` counts parts whose sidecar
    * base ACTUALLY loaded; parts the budget admitted but that had no
    * usable base (adopted/torn — they take the count+rebuild path)
    * show under `rebuiltParts` instead, while `loadedBytes` remains
    * the BUDGET charge (baseless parts are charged at the filter size
    * their rebuild materializes — the memory-honest number).
    * `grownParts` counts SATURATED cached shards rebuilt at a doubled
    * covering capacity — capacity growth on an already-warm filter, a
    * different signal from `rebuiltParts`' baseless rebuilds (r16
    * ADVICE: folding growth into rebuiltParts made a fully warm batch
    * that merely grew one filter look like warm-up still in progress).
    * `prepareSeq` increments once per [[prepare]] on this store in
    * this JVM — a poller that sees the same seq twice knows the
    * snapshot has stopped advancing (stopped query), not reached a
    * quiet steady state (r16 ADVICE: the registry is never cleared, so
    * without it a dashboard cannot tell a live steady state from a
    * dead query's final stats). Also emitted as a stable log line by
    * [[prepare]] (`BloomShards.warming store=...`). */
  final case class WarmingStats(loadedParts: Int, loadedBytes: Long,
                                deferredParts: Int, rebuiltParts: Int,
                                grownParts: Int,
                                cachedParts: Int, cachedBytes: Long,
                                prepareSeq: Long)

  private val warmingByStore =
    new java.util.concurrent.ConcurrentHashMap[String, WarmingStats]()

  /** The last [[prepare]]'s [[WarmingStats]] for `stateDir`, if any
    * prepare ran in this JVM ([[graft.api.Engine.registerGuardWarming]]
    * serves it as a pull-queryable view). */
  def lastWarming(stateDir: String): Option[WarmingStats] =
    Option(warmingByStore.get(stateDir))

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  def sidecarDir(stateDir: String): String = stateDir + ".__bloomparts"
  private def baseDir(stateDir: String) = sidecarDir(stateDir) + "/base"
  private def deltaDir(stateDir: String) = sidecarDir(stateDir) + "/delta"

  private val BaseMagic = 0x47425331 // "GBS1"
  private val DeltaMagic = 0x47424431 // "GBD1"

  private def deser(bytes: Array[Byte]): BloomFilter =
    BloomFilter.readFrom(new ByteArrayInputStream(bytes))

  private def ser(b: BloomFilter): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }

  /** Serialized size estimate of a `(capacity, fpp)` filter — the
    * optimal-bits formula [[BloomFilter.create]] uses, for budgeting
    * loads of parts that have no base file yet. */
  def bloomBytes(capacity: Long, fpp: Double): Long =
    (math.ceil(-capacity.toDouble * math.log(fpp) /
      (math.log(2) * math.log(2))) / 8).toLong + 32

  /** Smallest `cap0 * 2^i` strictly greater than `n` — geometric growth
    * makes total rebuild work amortized O(corpus) per doubling (the
    * dynamic-array argument). */
  private def cover(cap0: Long, n: Long): Long = {
    var c = math.max(cap0, 1L)
    while (c <= n) c *= 2
    c
  }

  // Sidecar writes go through a small dedicated pool: a full-touch
  // batch refreshes hundreds of base files, and metadata ops through
  // the Hadoop local FS measured ~10-35 ms EACH on this container
  // (FileContext.rename the worst — ~32 ms; plain FileSystem.rename
  // ~8 ms; 16-way parallel ~0.5 s for 256 files where sequential
  // FileContext took ~10 s). Daemon threads; IO failures propagate to
  // the awaiting batch and fail it, like any other store write.
  private lazy val writePool = java.util.concurrent.Executors
    .newFixedThreadPool(16, (r: Runnable) => {
      val t = new Thread(r, "bloom-sidecar-io")
      t.setDaemon(true)
      t
    })

  /** Replace `target` with freshly-written contents: tmp, delete,
    * rename (rename alone has no overwrite form on the FileSystem API,
    * and FileContext's is measured far slower). NOT atomic — a crash
    * between the delete and the rename leaves NO file — but that is the
    * SAFE direction for every sidecar file: a missing base sends the
    * part down the count+rebuild-from-store path, and a missing delta
    * only ever belongs to a batch whose checkpoint never committed (the
    * replay rewrites it). A torn tmp is never renamed in, and
    * [[readBase]]/[[readDelta]] tolerate torn targets anyway. */
  private def atomicWrite(fs: org.apache.hadoop.fs.FileSystem,
                          target: org.apache.hadoop.fs.Path)
                         (write: java.io.DataOutputStream => Unit): Unit = {
    val tmp = new org.apache.hadoop.fs.Path(
      target.getParent, target.getName + ".tmp")
    val out = new java.io.DataOutputStream(
      new java.io.BufferedOutputStream(fs.create(tmp, true)))
    try write(out) finally out.close()
    fs.delete(target, false)
    require(fs.rename(tmp, target),
      s"sidecar write failed: could not rename $tmp over $target")
  }

  /** One base file: the part's current filter + what it covers. */
  private final case class BaseFile(lineage: String, coversThrough: Long,
                                    capacity: Long, nItems: Long,
                                    bloom: BloomFilter)

  private def writeBase(fs: org.apache.hadoop.fs.FileSystem,
                        stateDir: String, part: Int, lineage: String,
                        coversThrough: Long, s: Shard): Unit = {
    // callers ensure the dir exists ONCE per batch — a per-part
    // exists+mkdirs pair is two FS ops × hundreds of refreshed parts
    val dir = new org.apache.hadoop.fs.Path(baseDir(stateDir))
    atomicWrite(fs, new org.apache.hadoop.fs.Path(dir, s"p$part")) { out =>
      out.writeInt(BaseMagic)
      out.writeUTF(lineage)
      out.writeLong(coversThrough)
      out.writeLong(s.capacity)
      out.writeLong(s.nItems)
      val bytes = ser(s.bloom)
      out.writeInt(bytes.length)
      out.write(bytes)
    }
  }

  private def readBase(fs: org.apache.hadoop.fs.FileSystem,
                       path: org.apache.hadoop.fs.Path,
                       withFilter: Boolean): Option[BaseFile] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(path)))
    try {
      if (in.readInt() != BaseMagic) return None
      val lineage = in.readUTF()
      val covers = in.readLong()
      val cap = in.readLong()
      val n = in.readLong()
      val bloom =
        if (!withFilter) null
        else {
          val len = in.readInt()
          val bytes = new Array[Byte](len)
          in.readFully(bytes)
          deser(bytes)
        }
      Some(BaseFile(lineage, covers, cap, n, bloom))
    } catch {
      case _: java.io.IOException => None // torn write: treat as absent
    } finally in.close()
  }

  /** `part -> base file status` from one listing (absent dir = empty). */
  private def listBases(fs: org.apache.hadoop.fs.FileSystem,
                        stateDir: String)
      : Map[Int, org.apache.hadoop.fs.FileStatus] = {
    val dir = new org.apache.hadoop.fs.Path(baseDir(stateDir))
    if (!fs.exists(dir)) Map.empty
    else fs.listStatus(dir).toIndexedSeq
      .flatMap { st =>
        val n = st.getPath.getName
        if (n.startsWith("p") && !n.endsWith(".tmp"))
          n.stripPrefix("p").toIntOption.map(_ -> st)
        else None
      }.toMap
  }

  /** Observability + spec surface: (part, capacity, n_items,
    * coversThrough) of every CURRENT-lineage base file. */
  def baseMeta(spark: SparkSession, stateDir: String,
               lineage: String): Map[Int, (Long, Long, Long)] = {
    val fs = new org.apache.hadoop.fs.Path(sidecarDir(stateDir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    listBases(fs, stateDir).flatMap { case (p, st) =>
      readBase(fs, st.getPath, withFilter = false)
        .filter(_.lineage == lineage)
        .map(b => p -> (b.capacity, b.nItems, b.coversThrough))
    }
  }

  /** Skip exactly `n` bytes. `DataInputStream.skipBytes(n * 8)` is
    * Int-armed — a section above ~268M hashes overflows to a negative
    * (no-op) skip and misparses the rest of the stream — and `skip`
    * itself may be short, so loop with a read fallback; a tear inside
    * the span surfaces as EOFException (an IOException), which callers
    * treat as a torn file. */
  private def skipFully(in: java.io.DataInputStream, n: Long): Unit = {
    var left = n
    while (left > 0) {
      val s = in.skip(left)
      if (s > 0) left -= s
      else { in.readByte(); left -= 1 }
    }
  }

  private def deltaFiles(fs: org.apache.hadoop.fs.FileSystem,
                         stateDir: String)
      : Seq[org.apache.hadoop.fs.FileStatus] = {
    val dir = new org.apache.hadoop.fs.Path(deltaDir(stateDir))
    if (!fs.exists(dir)) Nil
    else fs.listStatus(dir).toIndexedSeq
      .filter(st => st.getPath.getName.startsWith("d") &&
        !st.getPath.getName.endsWith(".tmp"))
  }

  /** One delta file's sections for `wanted` parts under `lineage`
    * (None = every part). Each SECTION carries its own batch id — a
    * merged file holds sections from many batches, and a file-level id
    * would either over-claim (skipping folds older bases still need) or
    * under-claim (skipping folds newer sections still need — a false
    * negative). Torn files read as empty (their batch never committed —
    * the replay rewrites them). */
  private def readDelta(fs: org.apache.hadoop.fs.FileSystem,
                        path: org.apache.hadoop.fs.Path, lineage: String,
                        wanted: Option[Set[Int]])
      : Seq[(Int, Long, Array[Long])] = {
    val in = new java.io.DataInputStream(
      new java.io.BufferedInputStream(fs.open(path)))
    try {
      if (in.readInt() != DeltaMagic) return Nil
      if (in.readUTF() != lineage) return Nil
      val nSections = in.readInt()
      val out = Seq.newBuilder[(Int, Long, Array[Long])]
      var i = 0
      while (i < nSections) {
        val p = in.readInt()
        val batchId = in.readLong()
        val n = in.readInt()
        if (wanted.forall(_.contains(p))) {
          val hs = new Array[Long](n)
          var j = 0
          while (j < n) { hs(j) = in.readLong(); j += 1 }
          out += ((p, batchId, hs))
        } else skipFully(in, n.toLong * 8)
        i += 1
      }
      out.result()
    } catch {
      case _: java.io.IOException => Nil
    } finally in.close()
  }

  private def writeDeltaFile(fs: org.apache.hadoop.fs.FileSystem,
                             stateDir: String, name: String,
                             lineage: String,
                             sections: Seq[(Int, Long, Array[Long])])
      : Unit = {
    val dir = new org.apache.hadoop.fs.Path(deltaDir(stateDir))
    if (!fs.exists(dir)) fs.mkdirs(dir)
    atomicWrite(fs, new org.apache.hadoop.fs.Path(dir, name)) { out =>
      out.writeInt(DeltaMagic)
      out.writeUTF(lineage)
      out.writeInt(sections.length)
      sections.foreach { case (p, batchId, hs) =>
        out.writeInt(p)
        out.writeLong(batchId)
        out.writeInt(hs.length)
        hs.foreach(out.writeLong)
      }
    }
  }

  /** Header-scan of the delta log: per `wanted` part, the payload bytes
    * of the own-lineage sections newer than that part's base cover
    * (i.e. what a load would fold). Payloads are skipped, never read —
    * the scan costs one header pass over the (file-count-bounded) log,
    * paid only by batches that actually have uncached parts. */
  private def deltaPendingBytes(fs: org.apache.hadoop.fs.FileSystem,
                                stateDir: String, lineage: String,
                                wanted: Map[Int, Long]): Map[Int, Long] = {
    val acc = scala.collection.mutable.HashMap.empty[Int, Long]
    deltaFiles(fs, stateDir).foreach { st =>
      val in = new java.io.DataInputStream(
        new java.io.BufferedInputStream(fs.open(st.getPath)))
      try {
        if (in.readInt() == DeltaMagic && in.readUTF() == lineage) {
          val nSections = in.readInt()
          var i = 0
          while (i < nSections) {
            val p = in.readInt()
            val batchId = in.readLong()
            val n = in.readInt()
            skipFully(in, n.toLong * 8)
            if (wanted.get(p).exists(batchId > _))
              acc(p) = acc.getOrElse(p, 0L) + n.toLong * 8
            i += 1
          }
        }
      } catch {
        case _: java.io.IOException => () // torn tail: count what parsed
      } finally in.close()
    }
    acc.toMap
  }

  /** Load `parts` into `cache` (cache hits untouched): per part, the
    * own-lineage base file with every delta section newer than its
    * `coversThrough` folded in (idempotent). Parts with deltas but no
    * base are NOT loaded — deltas alone can't prove membership (see the
    * object scaladoc). (The pre-round-14 root-parquet sidecar fallback
    * that used to backstop baseless parts was deleted in round 16 — no
    * deployed store remains without base files for its live parts, per
    * the documented deletion condition; a baseless live part now simply
    * takes the count+rebuild path, which is exact.) */
  private def loadInto(spark: SparkSession, stateDir: String,
                       lineage: String,
                       parts: Seq[Int], cache: Cache): Unit = {
    if (parts.isEmpty) return
    val fs = new org.apache.hadoop.fs.Path(sidecarDir(stateDir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val baseFiles = listBases(fs, stateDir)
    val bases: Map[Int, BaseFile] = parts.flatMap(p =>
      baseFiles.get(p).flatMap(st =>
        readBase(fs, st.getPath, withFilter = true))
        .filter(_.lineage == lineage).map(p -> _)).toMap
    if (bases.isEmpty) return
    val wanted = bases.keySet
    val folded = scala.collection.mutable.HashMap.empty[Int, Long]
    deltaFiles(fs, stateDir).foreach { st =>
      readDelta(fs, st.getPath, lineage, Some(wanted)).foreach {
        case (p, batchId, hs) =>
          val b = bases(p)
          if (batchId > b.coversThrough) {
            hs.foreach(b.bloom.putLong)
            folded(p) = folded.getOrElse(p, 0L) + hs.length
          }
      }
    }
    bases.foreach { case (p, b) =>
      cache.shards(p) =
        Shard(b.capacity, b.nItems + folded.getOrElse(p, 0L), b.bloom)
      // uncovered deltas pending: count them toward the refresh
      // threshold so long-lived delta suffixes eventually collapse
      folded.get(p).foreach { n =>
        cache.dirty += p
        cache.pendingHashes(p) = n
      }
    }
  }

  /** Rebuild the shards for `parts` from the store itself — a
    * partition-pruned read grouped on the partition key, ONE job for
    * all parts sharing a target `capacity` (per-part jobs would
    * serialize into a spike). `hashExpr` maps a store row to its Bloom
    * item (the fp store puts `__fp`; the band store
    * `xxhash64(band_key)`). `n_items` restarts from the partition's
    * actual row count. */
  def rebuild(spark: SparkSession, stateDir: String, partCol: String,
              hashExpr: Column, parts: Seq[Int], capacity: Long,
              fpp: Double): Map[Int, Shard] =
    if (parts.isEmpty) Map.empty
    else spark.read.parquet(stateDir)
      .filter(col(partCol).isin(parts: _*))
      .select(col(partCol).cast("int").as("__p"), hashExpr.as("__h"))
      .repartition(col("__p")) // co-partition: no serialized filter rides the shuffle
      .groupBy(col("__p"))
      .agg(SketchExpressions.bloomAgg(col("__h"), capacity, fpp)
        .as("bloom"), count(lit(1)).as("n"))
      .collect()
      .map(r => r.getInt(0) ->
        Shard(capacity, r.getLong(2), deser(r.getAs[Array[Byte]](1))))
      .toMap

  /** Probe-side preparation for a batch touching the LIVE store parts
    * `touched`: serve from the cache, load base+deltas for first-touch
    * parts, count-and-rebuild parts with no loadable base (adoption,
    * torn write, lineage change — their true size is unknown, so one
    * cheap grouped count sizes the rebuild to land at a covering
    * capacity immediately instead of saturating at birth), and rebuild
    * saturated shards (tracked `n_items` ≥ capacity) at a covering
    * doubled capacity. Capacities evolve PER SHARD — nothing ever
    * merges two filters, so no global geometry needs to hold.
    *
    * `maxLoadBytes` is a PER-BATCH warming budget, not an all-or-nothing
    * skip: each batch loads uncached parts (first-fit in part order —
    * own-lineage base files at their exact listed length PLUS the
    * pending delta bytes the load folds; `cap0`-filter estimates for
    * parts with no usable base — none, torn, or foreign lineage) until the
    * budget is spent, and DEFERS the rest. Deferred parts come back in
    * [[Prepared.deferred]]: the caller treats their rows as
    * bloom-positive ([[gate]]'s `Prepared` overload), which is exact —
    * the confirm read decides, and a false negative is impossible.
    * Because the cache persists across batches, a restarted full-touch
    * stream is fully warm after ~⌈totalBytes/maxLoadBytes⌉ batches; a
    * single part whose bytes exceed the whole budget stays deferred
    * (served by the confirm path) rather than blowing the budget. */
  def prepare(spark: SparkSession, stateDir: String, partCol: String,
              hashExpr: Column, lineage: String, touched: Seq[Int],
              cache: Cache, cap0: Long, fpp: Double,
              maxLoadBytes: Long = Long.MaxValue): Prepared = {
    cache.lastLoadBytes = 0L
    cache.lastDeferredCount = 0
    if (touched.isEmpty) {
      // still a liveness tick: prepareSeq must advance on EVERY prepare
      // or an idle-but-live query would read as dead to a seq poller —
      // including a query IDLE FROM BIRTH (no stats row yet), which
      // gets an all-zero row at seq 1 so it is observable as live
      // instead of StoreNotReadyException-ing the warming view forever
      val w = lastWarming(stateDir)
        .getOrElse(WarmingStats(0, 0L, 0, 0, 0, 0, 0L, 0L))
      warmingByStore.put(stateDir, w.copy(prepareSeq = w.prepareSeq + 1))
      return Prepared(Map.empty, Nil)
    }
    val missing = touched.filterNot(cache.shards.contains)
    var deferred: Seq[Int] = Nil
    var loadedParts = 0
    if (missing.nonEmpty) {
      val fs = new org.apache.hadoop.fs.Path(sidecarDir(stateDir))
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      val baseFiles = listBases(fs, stateDir)
      // per-part headers: a foreign-lineage or torn base can never be
      // loaded — its part takes the rebuild path, so its budget charge
      // is the cap0 filter the rebuild will materialize, not the file
      val headers: Map[Int, Option[BaseFile]] = missing.map(p =>
        p -> baseFiles.get(p).flatMap(st =>
          readBase(fs, st.getPath, withFilter = false))
          .filter(_.lineage == lineage)).toMap
      val pending: Map[Int, Long] = deltaPendingBytes(fs, stateDir,
        lineage, headers.collect { case (p, Some(b)) =>
          p -> b.coversThrough })
      val est: Seq[(Int, Long)] = missing.map { p =>
        p -> (headers(p) match {
          case Some(_) => baseFiles(p).getLen + pending.getOrElse(p, 0L)
          case None => bloomBytes(cap0, fpp)
        })
      }
      // explicit single-pass fold (not a partition with a side-effecting
      // predicate): consumes `est` exactly once, so the load/defer split
      // cannot depend on the collection's strictness
      var left = maxLoadBytes
      var loadBytes = 0L
      val load = Seq.newBuilder[Int]
      val defer = Seq.newBuilder[Int]
      est.foreach { case (p, b) =>
        if (b <= left) { left -= b; loadBytes += b; load += p }
        else defer += p
      }
      deferred = defer.result()
      cache.lastLoadBytes = loadBytes
      val toLoad = load.result()
      loadInto(spark, stateDir, lineage, toLoad, cache)
      // actually-loaded only: budget-admitted parts with no usable base
      // fall through loadInto to the rebuild below and are reported as
      // rebuilds, not loads (telemetry honesty — see [[WarmingStats]])
      loadedParts = toLoad.count(cache.shards.contains)
    }
    // live parts with no loadable base: count first (one job over
    // exactly those partitions, rare by construction), then rebuild at
    // a covering capacity — deferred parts are excluded (their state is
    // simply not loaded yet; rebuilding them would blow the budget)
    val deferredSet = deferred.toSet
    val unknown = touched.filterNot(cache.shards.contains)
      .filterNot(deferredSet)
    val unknownCounts: Map[Int, Long] =
      if (unknown.isEmpty) Map.empty
      else spark.read.parquet(stateDir)
        .filter(col(partCol).isin(unknown: _*))
        .groupBy(col(partCol)).count()
        .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val saturated = touched.flatMap(p => cache.shards.get(p)
      .filter(s => s.nItems >= s.capacity).map(p -> _.nItems))
    val targets: Map[Int, Long] =
      unknownCounts.map { case (p, n) => p -> cover(cap0, n) } ++
        saturated.map { case (p, n) => p -> cover(cap0, n) }
    targets.groupBy(_._2).foreach { case (cap, m) =>
      rebuild(spark, stateDir, partCol, hashExpr, m.keys.toSeq, cap, fpp)
        .foreach { case (p, s) =>
          cache.shards(p) = s
          cache.needBase += p
          cache.dirty -= p // the pending base write covers everything
          cache.pendingHashes.remove(p)
        }
    }
    touched.foreach(cache.touch)
    cache.lastDeferredCount = deferred.length
    // rebuilt = baseless (warm-up work); grown = saturated-capacity
    // doublings (steady-state maintenance) — reported separately so the
    // converging-vs-permanent signal stays clean (r16 ADVICE); prepare
    // is single-writer per store, so the +1 seq never races
    val stats = WarmingStats(loadedParts, cache.lastLoadBytes,
      deferred.length, unknownCounts.size, saturated.length,
      cache.heldParts, cache.heldBytes,
      lastWarming(stateDir).fold(1L)(_.prepareSeq + 1L))
    warmingByStore.put(stateDir, stats)
    // the stable warming line (see [[WarmingStats]]): emitted only when
    // the batch did warming or growth work, so a fully warm steady
    // state is silent
    if (loadedParts > 0 || deferred.nonEmpty || targets.nonEmpty)
      log.info(s"BloomShards.warming store=$stateDir " +
        s"loadedParts=$loadedParts loadedBytes=${cache.lastLoadBytes} " +
        s"deferredParts=${deferred.length} " +
        s"rebuiltParts=${unknownCounts.size} " +
        s"grownParts=${saturated.length} " +
        s"budgetBytes=$maxLoadBytes " +
        s"cachedParts=${cache.heldParts} cachedBytes=${cache.heldBytes} " +
        s"prepareSeq=${stats.prepareSeq}")
    Prepared(
      touched.flatMap(p => cache.shards.get(p).map(p -> _)).toMap,
      deferred)
  }

  /** The sharded probe gate over [[prepare]]'s shards — false (nothing
    * accepted in these slices) when empty. `nParts` is the store's
    * pinned partition count; the expression routes each hash to
    * `pmod(hash, nParts)`, which is exactly the store's layout key. */
  def gate(hashCol: Column, shards: Map[Int, Shard],
           nParts: Int): Column =
    if (shards.isEmpty) lit(false)
    else {
      val arr = new Array[BloomFilter](nParts)
      shards.foreach { case (p, s) => arr(p) = s.bloom }
      SketchExpressions.bloomMightContainSharded(hashCol, arr)
    }

  /** [[gate]] over a full [[Prepared]]: the sharded probe OR-ed with
    * membership of the budget-DEFERRED parts — a row in a deferred part
    * is treated as bloom-positive (exact: the caller's confirm read
    * decides, and treating a live-but-unloaded part as positive can
    * never be a false negative), so warming stays incremental without
    * ever widening the gate for parts that ARE loaded. */
  def gate(hashCol: Column, partColumn: Column, prep: Prepared,
           nParts: Int): Column = {
    val sharded = gate(hashCol, prep.shards, nParts)
    if (prep.deferred.isEmpty) sharded
    else sharded || partColumn.isin(prep.deferred: _*)
  }

  /** Fold a batch's accepted hashes into the cache and the sidecar.
    * `fps` must be `(part: int, hash: long)` rows (by POSITION);
    * duplicates are deduped DRIVER-SIDE after the collect. Cached
    * shards take the hashes in memory (`putLong`); the batch writes ONE
    * delta file of packed per-part sections — bytes proportional to the
    * batch (a replay atomically overwrites its own file). Parts absent
    * from the cache are genuinely fresh (no live store data before this
    * batch — the caller prepared every live touched part) and get their
    * first BASE file, sized to cover the batch — unless the part is in
    * `deferred` (live, but [[prepare]]'s budget did not load it), in
    * which case the hashes ride the delta file only: a batch-built base
    * would claim to cover store history the filter lacks — a false
    * negative. The part's next warmed touch loads base + deltas as
    * usual. Base files are REFRESHED only for (a)
    * this batch's rebuilds (`needBase`) and (b) dirty shards whose
    * pending delta bytes exceed a quarter of their filter size — so
    * base write amplification stays bounded by ~4× the delta volume.
    * Past `maxDeltaFiles` the delta log merges down to the uncovered
    * sections. */
  def update(spark: SparkSession, stateDir: String, partCol: String,
             fps: DataFrame, cache: Cache, cap0: Long, fpp: Double,
             lineage: String, batchId: Long,
             deferred: Set[Int] = Set.empty,
             maxDeltaFiles: Int = 64): Unit = {
    val fs = new org.apache.hadoop.fs.Path(sidecarDir(stateDir))
      .getFileSystem(spark.sparkContext.hadoopConfiguration)
    val byPart: Map[Int, Array[Long]] = fps.collect()
      .map(r => (r.get(0).asInstanceOf[Number].intValue(), r.getLong(1)))
      .groupBy(_._1).map { case (p, a) => p -> a.map(_._2).distinct }
    val deltaSections = scala.collection.mutable.ArrayBuffer
      .empty[(Int, Array[Long])]
    byPart.toSeq.sortBy(_._1).foreach { case (p, hs) =>
      cache.shards.get(p) match {
        case Some(s) =>
          hs.foreach(s.bloom.putLong)
          cache.shards(p) = s.copy(nItems = s.nItems + hs.length)
          cache.dirty += p
          cache.pendingHashes(p) =
            cache.pendingHashes.getOrElse(p, 0L) + hs.length
          cache.touch(p)
          deltaSections += (p -> hs)
        case None =>
          if (deferred(p)) deltaSections += (p -> hs)
          else {
            val cap = cover(cap0, hs.length)
            val bf = BloomFilter.create(cap, fpp)
            hs.foreach(bf.putLong)
            cache.shards(p) = Shard(cap, hs.length, bf)
            cache.needBase += p
            cache.touch(p)
          }
      }
    }
    if (deltaSections.nonEmpty)
      writeDeltaFile(fs, stateDir, s"d$batchId", lineage,
        deltaSections.toSeq.map { case (p, hs) => (p, batchId, hs) })
    // base refreshes: rebuilds always; dirty shards only once their
    // pending deltas are worth a quarter of the filter — every base
    // written at batch b covers ≤ b (rebuilds read the store, which
    // holds every completed append; the cache holds everything folded)
    val refresh = cache.needBase.toSet ++ cache.dirty.filter { p =>
      cache.shards.get(p).exists(s =>
        cache.pendingHashes.getOrElse(p, 0L) * 8L >
          s.bloom.bitSize() / 8 / 4)
    }
    if (refresh.nonEmpty) {
      val bd = new org.apache.hadoop.fs.Path(baseDir(stateDir))
      if (!fs.exists(bd)) fs.mkdirs(bd)
      // parallel IO (see [[writePool]]): a full-touch refresh wave is
      // hundreds of small files, latency-bound on this FS; any failure
      // propagates and fails the batch before the flags clear
      implicit val ec: scala.concurrent.ExecutionContext =
        scala.concurrent.ExecutionContext.fromExecutor(writePool)
      val writes = refresh.toSeq.sorted.flatMap(p =>
        cache.shards.get(p).map(s => scala.concurrent.Future {
          writeBase(fs, stateDir, p, lineage, batchId, s)
        }))
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(writes),
        scala.concurrent.duration.Duration.Inf)
      refresh.foreach { p =>
        if (cache.shards.contains(p)) {
          cache.needBase -= p
          cache.dirty -= p
          cache.pendingHashes.remove(p)
        }
      }
    }
    cache.evictToBudget()
    // delta-log truncation: merge down to the sections newer than their
    // part's base (foreign-lineage and covered sections drop — loads
    // ignore them anyway)
    val files = deltaFiles(fs, stateDir)
    if (files.length > math.max(maxDeltaFiles, 1))
      truncateDeltas(fs, stateDir, lineage, files, batchId)
  }

  /** Merge the delta log down to the sections no base covers yet.
    * Crash-safety and memory, in that order of importance:
    *
    *  - The merged file gets a FRESH name (`dm<batchId>`, suffixed past
    *    any existing file): [[atomicWrite]] deletes its target before
    *    renaming the tmp in, so a replayed truncation writing over a
    *    LEFTOVER merge (crash after its rename, before the old deletes
    *    finished) could otherwise delete the only copy of sections that
    *    survive solely in that leftover — a Bloom false negative if the
    *    crash recurred between the delete and the rename. With a
    *    never-colliding name the old merge is deleted only AFTER the new
    *    one is renamed in, like every other source file.
    *  - Sections are STREAMED one at a time (two header passes: count,
    *    then copy), so driver memory is bounded by the largest single
    *    section — one batch's per-part hashes — not the uncovered
    *    volume, which at the design point is ~quarter of the corpus
    *    filter. Duplicate `(part, batchId)` sections (a leftover merge
    *    plus its sources) are byte-identical by construction and copied
    *    once.
    *  - A section counts/copies only after its payload is fully
    *    consumed, so a torn tail truncates both passes at the same
    *    point and the declared section count always matches the body. */
  private def truncateDeltas(fs: org.apache.hadoop.fs.FileSystem,
                             stateDir: String, lineage: String,
                             files: Seq[org.apache.hadoop.fs.FileStatus],
                             batchId: Long): Unit = {
    val covers: Map[Int, Long] = listBases(fs, stateDir)
      .flatMap { case (p, st) =>
        readBase(fs, st.getPath, withFilter = false)
          .filter(_.lineage == lineage).map(p -> _.coversThrough)
      }
    // one pass over the log's section headers; `emit` receives each
    // live section's header and its fully-read payload bytes
    def scan(emit: (Int, Long, Int, Array[Byte]) => Unit): Long = {
      val seen = scala.collection.mutable.Set.empty[(Int, Long)]
      var count = 0L
      files.foreach { st =>
        val in = new java.io.DataInputStream(
          new java.io.BufferedInputStream(fs.open(st.getPath)))
        try {
          if (in.readInt() == DeltaMagic && in.readUTF() == lineage) {
            val nSections = in.readInt()
            var i = 0
            while (i < nSections) {
              val p = in.readInt()
              val b = in.readLong()
              val n = in.readInt()
              val live = b > covers.getOrElse(p, -1L) &&
                !seen.contains((p, b))
              if (live) {
                val payload = new Array[Byte](math.toIntExact(n.toLong * 8))
                in.readFully(payload) // a tear here drops the section in BOTH passes
                emit(p, b, n, payload)
                seen.add((p, b))
                count += 1
              } else skipFully(in, n.toLong * 8)
              i += 1
            }
          }
        } catch {
          case _: java.io.IOException => () // torn tail: stop this file
        } finally in.close()
      }
      count
    }
    val nLive = scan((_, _, _, _) => ())
    val names = files.map(_.getPath.getName).toSet
    val mergedName = Iterator.from(0)
      .map(i => if (i == 0) s"dm$batchId" else s"dm$batchId-$i")
      .find(!names.contains(_)).get
    atomicWrite(fs, new org.apache.hadoop.fs.Path(
      new org.apache.hadoop.fs.Path(deltaDir(stateDir)), mergedName)) {
      out =>
        out.writeInt(DeltaMagic)
        out.writeUTF(lineage)
        out.writeInt(math.toIntExact(nLive))
        val copied = scan { (p, b, n, payload) =>
          out.writeInt(p)
          out.writeLong(b)
          out.writeInt(n)
          out.write(payload)
        }
        // single-writer: the log cannot change between the passes
        require(copied == nLive,
          s"delta truncation drift: counted $nLive, copied $copied")
    }
    files.foreach(st => fs.delete(st.getPath, false))
  }
}
