package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.GraftColumnBridge
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.UnaryExpression
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types.{BooleanType, DataType}
import org.apache.spark.util.sketch.BloomFilter

/** Native Catalyst expressions over driver-built sketches.
  *
  * Spark exposes `DataFrameStatFunctions.bloomFilter` to BUILD a
  * [[BloomFilter]] (a treeAggregate of partition-local bitmaps — no row
  * shuffle) but gives no public expression to PROBE one from SQL; the
  * engine's probe runs interpreted only inside Spark's own runtime-filter
  * rewrite. [[BloomMightContain]] closes that gap as a whole-stage-codegen
  * projection: the filter object ships once per task as a codegen reference
  * object (same mechanism as [[LshSignBucket]]'s plane matrix) and each row
  * costs `k` bit probes — no join, no shuffle, no per-row deserialization.
  */
object SketchExpressions {

  /** `bloom_might_contain(h)` — true iff the 64-bit hash column `h` might
    * be in `bloom` (no false negatives; false-positive rate is the filter's
    * `fpp`), codegen'd. */
  def bloomMightContain(h: Column, bloom: BloomFilter): Column =
    GraftColumnBridge.column(
      BloomMightContain(GraftColumnBridge.expression(h), bloom))

  /** `shingle_overlap(text)` — the number of DISTINCT n-gram shingles of
    * `text` whose 60-bit hash appears in `sortedHashes` (a sorted,
    * deduplicated eval-set array shipped once per task as a plan
    * constant). Exact membership — not a Bloom — because a false positive
    * here would DROP a clean training document; binary search costs
    * log₂|eval| per gram. Tokenization and hashing are bit-parity twins
    * of [[graft.operators.Dedup.shingleRows]] (lowercase `\\s+` split,
    * space-joined grams, md5 h1), so the result equals the batch
    * semi-join's `n_overlap` exactly. */
  def shingleOverlap(text: Column, sortedHashes: Array[Long],
                     n: Int): Column =
    GraftColumnBridge.column(
      ShingleOverlap(GraftColumnBridge.expression(text), sortedHashes, n))

  /** `shingle_stats(text)` — `[distinct shingles, distinct matched]` in
    * one gram pass: numerator and denominator of the contamination
    * fraction from the same probe loop as [[shingleOverlap]]. */
  def shingleStats(text: Column, sortedHashes: Array[Long],
                   n: Int): Column =
    GraftColumnBridge.column(
      ShingleStats(GraftColumnBridge.expression(text), sortedHashes, n))

  /** `minhash_sig(text)` — the k-long MinHash signature of a document's
    * n-gram shingle set in ONE codegen'd pass over the grams (one md5
    * each), null when the document has fewer than n tokens. Replaces an
    * explode → per-shingle projection → groupBy(doc) shuffle of ~(tokens
    * per doc) rows per document with zero shuffle and zero intermediate
    * rows; bit-parity with that pipeline is pinned by spec, so every
    * MinHash surface (batch candidates, Jaccard estimates, the streaming
    * band stores, the guard's near-dup stage) keeps its oracle-checked
    * values. */
  def minhashSig(text: Column, k: Int, n: Int): Column =
    GraftColumnBridge.column(
      MinHashSig(GraftColumnBridge.expression(text), k, n))

  /** `simhash_sig(text)` — the 32-bit (or, `wide`, 64-bit) SimHash of a
    * document's token stream in ONE codegen'd pass (one md5 per token),
    * null on null text. Replaces the explode → per-token hash → 32/64
    * `sum(CASE)` aggregates → groupBy(doc) shuffle of
    * [[graft.operators.Dedup.simhash]]/[[graft.operators.Dedup.simhashWide]]
    * with zero shuffle, zero intermediate rows and a 32/64-term-smaller
    * expression tree (the aggregate form was also a planning-time cost).
    * Bit-parity with that pipeline — same tokenizer, same
    * [[Hashing.hash64]]/[[Hashing.hash64Hi]] md5 derivations, same
    * sign-of-sum bit rule with ties → 0 — is pinned in DedupSpec against
    * the inlined legacy formula, so the oracle-checked simhash surfaces
    * (`q_simhash`, `q_simhash_neardup`, `q_simhash_neardup_wide`, the
    * streaming NearDup stores) keep their values. */
  def simhashSig(text: Column, wide: Boolean): Column =
    GraftColumnBridge.column(
      SimHashSig(GraftColumnBridge.expression(text), wide))

  /** `gram_hashes(toks)` — per n-gram position `i` of a token array, the
    * `(i, h1, h2)` 60-bit md5 halves of the space-joined gram, in ONE
    * incremental-digest pass (md5 consumes the token bytes directly; no
    * per-gram string or concat allocation). Replaces the
    * `explode(sequence) → toks[i] || ' ' || … → md5 → conv(substring)`
    * pipeline under [[graft.operators.Dedup.shingleRows]] /
    * `positionalGramRows` — the dominant CPU of every shingle-family
    * operator; same downstream explode, so plan shape and shuffle
    * payloads are unchanged. Empty array when the document has fewer
    * than n tokens. Bit-parity with the SQL fragments
    * ([[Hashing.hash64]]/[[Hashing.hash64Hi]] over the joined gram) is
    * pinned in DedupSpec. */
  def gramHashes(toks: Column, n: Int): Column =
    GraftColumnBridge.column(
      GramHashes(GraftColumnBridge.expression(toks), n))

  /** SHARDED [[bloomMightContain]]: `shards(pmod(h, shards.length))`
    * answers for `h`, a null shard meaning "definitively not present"
    * (that slice of the key space has no members — e.g. the store has no
    * such partition). One expression, one codegen span, probes only the
    * one filter its row's shard index selects — the gate for a store
    * whose Bloom sidecars are kept PER PARTITION so each is sized to its
    * slice and rebuilt from one partition, never the whole store
    * ([[graft.streaming.BloomShards]]). */
  def bloomMightContainSharded(h: Column,
                               shards: Array[BloomFilter]): Column =
    GraftColumnBridge.column(
      BloomMightContainSharded(GraftColumnBridge.expression(h), shards))

  /** Grouped Bloom BUILD as an [[org.apache.spark.sql.expressions.Aggregator]]
    * (the house alternative to a UDAF): one filter of (`expectedItems`,
    * `fpp`) geometry per group, returned serialized. All groups of one
    * call share the geometry, so driver-side `mergeInPlace` with
    * same-geometry sidecar filters is always compatible. Group FIRST by
    * the shard key after a `repartition` on it — partial buffers then
    * merge in-task and no serialized filter ever rides the shuffle (the
    * rows do, at 8 bytes each). */
  def bloomAgg(h: Column, expectedItems: Long, fpp: Double): Column =
    org.apache.spark.sql.functions.udaf(
      new BloomLongAgg(expectedItems, fpp),
      org.apache.spark.sql.Encoders.scalaLong).apply(h)
}

/** [[SketchExpressions.bloomAgg]]'s aggregator: fold LONG hashes into a
  * [[BloomFilter]] per group. The buffer is the filter itself
  * (java-serialized between partial and final aggregation — avoid by
  * co-partitioning on the group key first); finish emits the wire bytes
  * [[BloomFilter.readFrom]] understands. */
class BloomLongAgg(expectedItems: Long, fpp: Double)
    extends org.apache.spark.sql.expressions.Aggregator[
      Long, BloomFilter, Array[Byte]] {
  override def zero: BloomFilter = BloomFilter.create(expectedItems, fpp)
  override def reduce(b: BloomFilter, h: Long): BloomFilter = {
    b.putLong(h); b
  }
  override def merge(a: BloomFilter, b: BloomFilter): BloomFilter =
    a.mergeInPlace(b)
  override def finish(b: BloomFilter): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    b.writeTo(bos)
    bos.toByteArray
  }
  override def bufferEncoder: org.apache.spark.sql.Encoder[BloomFilter] =
    org.apache.spark.sql.Encoders.javaSerialization[BloomFilter]
  override def outputEncoder: org.apache.spark.sql.Encoder[Array[Byte]] =
    org.apache.spark.sql.Encoders.BINARY
}

/** The probe kernel, static so generated code calls it directly. */
object ShingleProbe {

  // MessageDigest.getInstance per call is a provider lookup — the original
  // kernel spent more time there than hashing (measured 3× slower than the
  // semi-join form); one digest per task thread, reset per gram.
  private val md = ThreadLocal.withInitial[java.security.MessageDigest](
    () => java.security.MessageDigest.getInstance("MD5"))

  // Tokenizer bit-parity with the batch twin `split(lower(text), '\s+')`:
  // lowercase via UTF8String.toLowerCase (Spark's own locale-independent
  // lower(); default-locale String.toLowerCase diverges on tr/az JVMs),
  // and split with limit -1 (Spark keeps trailing empty tokens; Java's
  // one-arg String.split drops them, so trailing whitespace would shift
  // the final gram's text and hash).
  private val ws = java.util.regex.Pattern.compile("\\s+")

  /** 60-bit md5 h1 of the UTF-8 bytes — bit-parity with
    * [[Hashing.hash64]]'s `substring(md5, 1, 15)`: the first 15 hex chars
    * are the first 60 bits, i.e. the big-endian first 8 bytes shifted
    * right 4 (unsigned). [[CmsSketch.fingerprints]] pins the equivalence
    * in SketchSpec via the string route; this is the allocation-free one. */
  private def h1(bytes: Array[Byte]): Long = {
    val m = md.get(); m.reset()
    val dg = m.digest(bytes)
    var v = 0L
    var i = 0
    while (i < 8) { v = (v << 8) | (dg(i) & 0xffL); i += 1 }
    v >>> 4
  }

  def overlap(text: org.apache.spark.unsafe.types.UTF8String,
              sorted: Array[Long], n: Int): Long =
    stats(text, sorted, n)(1)

  /** One-pass MinHash signature: k Kirsch-Mitzenmacher minima
    * (`h_i = h1 + i·(h2 & maskKM)`) over the document's n-gram shingles,
    * one md5 per gram — BIT-PARITY with the SQL pipeline it replaces
    * (`Dedup.shingleRows` → k `min` aggregates): same tokenizer as
    * [[stats]], h1 = md5 hex chars 1-15 (= big-endian bytes 0-7 >>> 4),
    * h2 = hex chars 17-31 (= bytes 8-15 >>> 4), both the
    * [[graft.functions.Hashing.hash64]]/[[graft.functions.Hashing.hash64Hi]]
    * contracts. Null for documents with fewer than n tokens (the old
    * pipeline's `size(toks) >= n` filter). No overflow: h1 < 2^60,
    * i·h2m < 15·2^56, sum < 2^61. */
  def minhashSig(text: org.apache.spark.unsafe.types.UTF8String,
                 k: Int, n: Int): Array[Long] = {
    val toks = ws.split(text.toLowerCase.toString, -1)
    if (toks.length < n) return null
    val sig = Array.fill(k)(Long.MaxValue)
    val sb = new java.lang.StringBuilder
    val m = md.get()
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      m.reset()
      val dg = m.digest(sb.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h1 = 0L
      var b = 0
      while (b < 8) { h1 = (h1 << 8) | (dg(b) & 0xffL); b += 1 }
      h1 = h1 >>> 4
      var h2 = 0L
      while (b < 16) { h2 = (h2 << 8) | (dg(b) & 0xffL); b += 1 }
      val h2m = (h2 >>> 4) & Hashing.maskKM
      var q = 0
      var v = h1
      while (q < k) {
        if (v < sig(q)) sig(q) = v
        v += h2m; q += 1
      }
      i += 1
    }
    sig
  }

  /** One-pass SimHash: per token, md5 once; h1 (and, wide, h2) votes ±1
    * on each signature bit; bit set iff its vote sum is strictly
    * positive. BIT-PARITY with the aggregate pipeline it replaces
    * ([[graft.operators.Dedup.simhash]]'s `sum(CASE WHEN bit THEN 1 ELSE
    * -1) > 0` per bit): same tokenizer as [[stats]] (every token
    * occurrence votes, empty tokens included — `split` never yields an
    * empty array), h1 = md5 bytes 0-7 >>> 4 ([[Hashing.hash64]]), h2 =
    * bytes 8-15 >>> 4 ([[Hashing.hash64Hi]]); wide maps h1 to bits 0-31
    * and h2 to bits 32-63, exactly [[graft.operators.Dedup.simhashWide]]'s
    * `(src, b)` layout. */
  def simhash(text: org.apache.spark.unsafe.types.UTF8String,
              wide: Boolean): Long = {
    val toks = ws.split(text.toLowerCase.toString, -1)
    val bits = if (wide) 64 else 32
    val counts = new Array[Int](bits)
    val m = md.get()
    var i = 0
    while (i < toks.length) {
      m.reset()
      val dg = m.digest(toks(i)
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      var h1 = 0L
      var b = 0
      while (b < 8) { h1 = (h1 << 8) | (dg(b) & 0xffL); b += 1 }
      h1 = h1 >>> 4
      var j = 0
      while (j < 32) {
        counts(j) += (if (((h1 >>> j) & 1L) == 1L) 1 else -1); j += 1
      }
      if (wide) {
        var h2 = 0L
        while (b < 16) { h2 = (h2 << 8) | (dg(b) & 0xffL); b += 1 }
        h2 = h2 >>> 4
        j = 0
        while (j < 32) {
          counts(32 + j) += (if (((h2 >>> j) & 1L) == 1L) 1 else -1); j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < bits) { if (counts(j) > 0) sig |= 1L << j; j += 1 }
    sig
  }

  /** One incremental-digest pass per document: `(i, h1, h2)` rows for
    * every n-gram position of a token array. The digest consumes each
    * token's UTF-8 bytes plus a 0x20 separator directly (UTF-8 of the
    * space-joined gram, byte-identical to `md5(toks[i] || ' ' || …)`);
    * h1 = digest bytes 0-7 >>> 4, h2 = bytes 8-15 >>> 4 — the
    * [[Hashing.hash64]]/[[Hashing.hash64Hi]] contracts. Null tokens
    * (impossible from `split`, guarded anyway) null-propagate to
    * (i, null, null), matching the SQL concat's null semantics. */
  def gramHashes(toks: org.apache.spark.sql.catalyst.util.ArrayData,
                 n: Int): org.apache.spark.sql.catalyst.util.ArrayData = {
    val len = toks.numElements()
    val nGrams = math.max(0, len - n + 1)
    val out = new Array[Any](nGrams)
    if (nGrams == 0)
      return new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
    val tokBytes = new Array[Array[Byte]](len)
    var t = 0
    while (t < len) {
      tokBytes(t) =
        if (toks.isNullAt(t)) null else toks.getUTF8String(t).getBytes
      t += 1
    }
    val m = md.get()
    var i = 0
    while (i < nGrams) {
      var anyNull = false
      var j = 0
      while (j < n && !anyNull) { anyNull = tokBytes(i + j) == null; j += 1 }
      if (anyNull) {
        out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, null, null))
      } else {
        m.reset()
        j = 0
        while (j < n) {
          if (j > 0) m.update(0x20.toByte)
          m.update(tokBytes(i + j)); j += 1
        }
        val dg = m.digest()
        var h1 = 0L
        var b = 0
        while (b < 8) { h1 = (h1 << 8) | (dg(b) & 0xffL); b += 1 }
        var h2 = 0L
        while (b < 16) { h2 = (h2 << 8) | (dg(b) & 0xffL); b += 1 }
        out(i) = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(
          Array[Any](i, h1 >>> 4, h2 >>> 4))
      }
      i += 1
    }
    new org.apache.spark.sql.catalyst.util.GenericArrayData(out)
  }

  /** One pass over the grams: `[distinct shingles, distinct matched]` —
    * the numerator AND denominator of the contamination fraction. */
  def stats(text: org.apache.spark.unsafe.types.UTF8String,
            sorted: Array[Long], n: Int): Array[Long] = {
    val toks = ws.split(text.toLowerCase.toString, -1)
    if (toks.length < n) return Array(0L, 0L)
    val seen = new java.util.HashSet[java.lang.Long]()
    var matched = 0L
    val sb = new java.lang.StringBuilder
    var i = 0
    while (i <= toks.length - n) {
      sb.setLength(0)
      var j = 0
      while (j < n) {
        if (j > 0) sb.append(' ')
        sb.append(toks(i + j)); j += 1
      }
      val h = h1(sb.toString
        .getBytes(java.nio.charset.StandardCharsets.UTF_8))
      if (seen.add(h) && java.util.Arrays.binarySearch(sorted, h) >= 0)
        matched += 1L
      i += 1
    }
    Array(seen.size.toLong, matched)
  }
}

/** Distinct-shingle overlap of a text column against a sorted eval-hash
  * array; the array is a plan constant probed in-loop inside whole-stage
  * codegen — no join, no shuffle, no state, so the expression runs
  * unchanged on a STREAMING DataFrame in append mode. */
case class ShingleOverlap(child: Expression, sortedHashes: Array[Long],
                          n: Int) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "shingle_overlap"

  override protected def nullSafeEval(v: Any): Any =
    ShingleProbe.overlap(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
      sortedHashes, n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val arr = ctx.addReferenceObj("evalHashes", sortedHashes, "long[]")
      s"${ev.value} = graft.functions.ShingleProbe.overlap($v, $arr, $n);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** One-pass MinHash signature of a text column (see
  * [[SketchExpressions.minhashSig]]); null for sub-n-token documents, so
  * callers filter rather than aggregate empties. */
case class MinHashSig(child: Expression, k: Int, n: Int)
    extends UnaryExpression {
  require(k > 0 && n > 0, "minhash_sig needs k > 0 and n > 0")

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def nullable: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(v: Any): Any = {
    val sig = ShingleProbe.minhashSig(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], k, n)
    if (sig == null) null
    else new org.apache.spark.sql.catalyst.util.GenericArrayData(sig)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val sig = ctx.freshName("sig")
      s"""long[] $sig = graft.functions.ShingleProbe.minhashSig($v, $k, $n);
         |if ($sig == null) {
         |  ${ev.isNull} = true;
         |} else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($sig);
         |}""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** One-pass SimHash of a text column (see
  * [[SketchExpressions.simhashSig]]); null on null text, like the explode
  * pipeline it replaces (explode of a null token array emitted no row). */
case class SimHashSig(child: Expression, wide: Boolean)
    extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "simhash_sig"

  override protected def nullSafeEval(v: Any): Any =
    ShingleProbe.simhash(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], wide)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleProbe.simhash($v, $wide);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Per-position n-gram hashes of a token array (see
  * [[SketchExpressions.gramHashes]]): `array<struct<i int, h1 bigint,
  * h2 bigint>>`, empty below n tokens, null on null input (like the
  * sequence-explode form, whose `size(toks)` filter dropped those docs). */
case class GramHashes(child: Expression, n: Int) extends UnaryExpression {
  require(n > 0, "gram_hashes needs n > 0")

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("i",
        org.apache.spark.sql.types.IntegerType, nullable = false),
      org.apache.spark.sql.types.StructField("h1",
        org.apache.spark.sql.types.LongType, nullable = true),
      org.apache.spark.sql.types.StructField("h2",
        org.apache.spark.sql.types.LongType, nullable = true))),
    containsNull = false)
  override def prettyName: String = "gram_hashes"

  override protected def nullSafeEval(v: Any): Any =
    ShingleProbe.gramHashes(
      v.asInstanceOf[org.apache.spark.sql.catalyst.util.ArrayData], n)

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = graft.functions.ShingleProbe.gramHashes($v, $n);")

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Sharded membership probe: `shards` is indexed by `pmod(value,
  * shards.length)` — the same shard arithmetic as the store's partition
  * key — and a null entry short-circuits to false (no members in that
  * slice). The array ships once per task as a codegen reference object,
  * exactly like the single-filter form. */
case class BloomMightContainSharded(child: Expression,
                                    shards: Array[BloomFilter])
    extends UnaryExpression {
  require(shards.nonEmpty, "bloom_might_contain_sharded needs >= 1 shard")

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain_sharded"

  private val n = shards.length

  override protected def nullSafeEval(v: Any): Any = {
    val h = v.asInstanceOf[Long]
    val b = shards((((h % n) + n) % n).toInt)
    b != null && b.mightContainLong(h)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val arr = ctx.addReferenceObj("bloomShards", shards,
        s"${classOf[BloomFilter].getName}[]")
      val idx = ctx.freshName("shardIdx")
      s"""int $idx = (int) ((($v % ${n}L) + ${n}L) % ${n}L);
         |${ev.value} = $arr[$idx] != null &&
         |  $arr[$idx].mightContainLong($v);""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** `[n_shingles, n_overlap]` of a text column in one gram pass; same plan
  * constant and codegen mechanics as [[ShingleOverlap]]. */
case class ShingleStats(child: Expression, sortedHashes: Array[Long],
                        n: Int) extends UnaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.ArrayType(
    org.apache.spark.sql.types.LongType, containsNull = false)
  override def prettyName: String = "shingle_stats"

  override protected def nullSafeEval(v: Any): Any =
    new org.apache.spark.sql.catalyst.util.GenericArrayData(
      ShingleProbe.stats(
        v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String],
        sortedHashes, n))

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val arr = ctx.addReferenceObj("evalHashes", sortedHashes, "long[]")
      s"""${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.ShingleProbe.stats($v, $arr, $n));""".stripMargin
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}

/** Membership probe of a LONG column against a driver-built Bloom filter.
  * The filter is a plan constant: serialized with the task binary, probed
  * in-loop inside whole-stage codegen. */
case class BloomMightContain(child: Expression, bloom: BloomFilter)
    extends UnaryExpression {

  override def dataType: DataType = BooleanType
  override def prettyName: String = "bloom_might_contain"

  override protected def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v => {
      val bf = ctx.addReferenceObj("bloom", bloom,
        classOf[BloomFilter].getName)
      s"${ev.value} = $bf.mightContainLong($v);"
    })

  override protected def withNewChildInternal(newChild: Expression)
      : Expression = copy(child = newChild)
}
