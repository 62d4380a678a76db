package graft.expressions

import scala.collection.mutable

import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.unsafe.types.UTF8String

/** Per-row kernels shared by the interpreted (`nullSafeEval`) and generated
  * (`doGenCode`) paths of the custom expressions. A top-level Scala object
  * with no companion class compiles to static forwarder methods, so
  * whole-stage-generated Java can call `graft.expressions.ExprKernels.x(...)`
  * directly — no `InternalRow` boxing, no virtual `Expression.eval` dispatch
  * (the two costs of `CodegenFallback`). The JIT inlines these static calls
  * into the generated stage.
  *
  * Semantics are byte-identical to the round-2 interpreted bodies: the
  * kernels ARE those bodies, moved verbatim.
  */
object ExprKernels {

  /** MinHashSigExpr kernel: k per-seed minima of `mix(h ^ seed_i)` over the
    * word n-gram shingle hashes, one pass, no shingle strings. */
  def minhashSig(raw: String, n: Int, seeds: Array[Long]): ArrayData = {
    val k = seeds.length
    val mins = Array.fill(k)(Long.MaxValue)
    ShingleHashing.foreachShingleHash(raw, n) { h =>
      var i = 0
      while (i < k) {
        val v = ShingleHashing.mix(h ^ seeds(i))
        if (v < mins(i)) mins(i) = v
        i += 1
      }
    }
    val out = new Array[Any](k)
    var j = 0
    while (j < k) { out(j) = mins(j); j += 1 }
    new GenericArrayData(out)
  }

  /** SimHashExpr kernel: per-bit vote over DISTINCT shingle hashes, sign
    * packed to a long. */
  def simhash(raw: String, n: Int): Long = {
    val votes = new Array[Int](64)
    val seen = new java.util.HashSet[java.lang.Long]()
    ShingleHashing.foreachShingleHash(raw, n) { h =>
      if (seen.add(h)) {
        var i = 0
        while (i < 64) {
          if (((h >>> i) & 1L) == 1L) votes(i) += 1 else votes(i) -= 1
          i += 1
        }
      }
    }
    var sig = 0L
    var i = 0
    while (i < 64) {
      if (votes(i) > 0) sig |= (1L << i)
      i += 1
    }
    sig
  }

  /** NormalizeTextExpr kernel: 0=NFC, 1=NFKC, 2=strip accents (NFD ->
    * drop Mn -> NFC). Fast path: Normalizer.isNormalized skips the
    * rebuild for already-normalized (e.g. ASCII) input. */
  def normalizeText(raw: String, mode: Int): UTF8String = {
    import java.text.Normalizer
    val out = mode match {
      case 0 =>
        if (Normalizer.isNormalized(raw, Normalizer.Form.NFC)) raw
        else Normalizer.normalize(raw, Normalizer.Form.NFC)
      case 1 =>
        if (Normalizer.isNormalized(raw, Normalizer.Form.NFKC)) raw
        else Normalizer.normalize(raw, Normalizer.Form.NFKC)
      case _ =>
        val d = Normalizer.normalize(raw, Normalizer.Form.NFD)
        var hasMark = false
        var i = 0
        while (i < d.length && !hasMark) {
          if (Character.getType(d.charAt(i)) == Character.NON_SPACING_MARK)
            hasMark = true
          i += 1
        }
        if (!hasMark) Normalizer.normalize(d, Normalizer.Form.NFC)
        else {
          val sb = new java.lang.StringBuilder(d.length)
          var j = 0
          while (j < d.length) {
            val ch = d.charAt(j)
            if (Character.getType(ch) != Character.NON_SPACING_MARK) sb.append(ch)
            j += 1
          }
          Normalizer.normalize(sb.toString, Normalizer.Form.NFC)
        }
    }
    UTF8String.fromString(out)
  }

  /** ShingleHashSetExpr kernel: the DISTINCT FNV-1a-64 hashes of the word
    * n-gram shingles — the set-valued input of sketch aggregates (KMV).
    * Same tokenization/hash as the simhash/minhash path, so the q32
    * DuckDB replay recipe (HUGEINT multiply mod 2^64) applies verbatim. */
  def shingleFnvSet(raw: String, n: Int): ArrayData = {
    val seen = new java.util.LinkedHashSet[java.lang.Long]()
    ShingleHashing.foreachShingleHash(raw, n)(h => seen.add(h))
    val out = new Array[Any](seen.size)
    val it = seen.iterator()
    var i = 0
    while (it.hasNext) { out(i) = it.next().longValue(); i += 1 }
    new GenericArrayData(out)
  }

  /** ShingleExpr kernel: word n-gram shingle strings of lowercased text.
    * `distinct` keeps first occurrence (array_distinct semantics); otherwise
    * every window occurrence in order. Fewer than n tokens yield one shingle
    * of all tokens joined. */
  def shingles(raw: String, n: Int, distinct: Boolean): ArrayData = {
    // Locale.ROOT: matches Spark's locale-independent lower(); the JVM
    // default locale (e.g. tr-TR dotless i) must not change signatures.
    val text = raw.toLowerCase(java.util.Locale.ROOT)
    val toks = text.split(" ", -1)
    val out: mutable.Growable[UTF8String] with Iterable[UTF8String] =
      if (distinct) new mutable.LinkedHashSet[UTF8String]
      else new mutable.ArrayBuffer[UTF8String]
    if (toks.length >= n) {
      val sb = new java.lang.StringBuilder
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        out += UTF8String.fromString(sb.toString)
        i += 1
      }
    } else {
      out += UTF8String.fromString(toks.mkString(" "))
    }
    new GenericArrayData(out.toArray[Any])
  }

  /** TopGramStatsExpr kernel: `[total, top]` word n-gram OCCURRENCE counts
    * — total windows and the count of the single most frequent gram.
    * Counts exact gram strings (not hashes): byte-parity with a string
    * GROUP BY oracle, no collision caveat. Fewer than n tokens yields one
    * gram of all tokens joined (shinglesAll fallback semantics). */
  def topGramStats(raw: String, n: Int): ArrayData = {
    val text = raw.toLowerCase(java.util.Locale.ROOT)
    val toks = text.split(" ", -1)
    val counts = new java.util.HashMap[String, Int]()
    var total = 0L
    var top = 0L
    val sb = new java.lang.StringBuilder
    def bump(g: String): Unit = {
      val c = counts.merge(g, 1, Integer.sum)
      total += 1
      if (c > top) top = c.toLong
    }
    if (toks.length >= n) {
      var i = 0
      while (i <= toks.length - n) {
        sb.setLength(0)
        var j = 0
        while (j < n) {
          if (j > 0) sb.append(' ')
          sb.append(toks(i + j))
          j += 1
        }
        bump(sb.toString)
        i += 1
      }
    } else {
      bump(toks.mkString(" "))
    }
    new GenericArrayData(Array[Any](total, top))
  }

  /** CosinesExpr kernel: cosine of the input vector against each literal
    * row, reusing the input norm; 0.0 when either norm is zero. */
  def cosines(arr: ArrayData, mat: Array[Array[Double]], rowNorms: Array[Double],
      isFloat: Boolean): ArrayData = {
    val n = arr.numElements()
    // fail loudly on dimension mismatch: silently truncating the dot while
    // dividing by the full row norm would give plausible-but-wrong cosines
    if (n != mat(0).length) throw new IllegalArgumentException(
      s"cosines: input vector has $n dims, literal rows have ${mat(0).length}")
    val v = new Array[Double](n)
    var i = 0
    while (i < n) { v(i) = if (isFloat) arr.getFloat(i).toDouble else arr.getDouble(i); i += 1 }
    var vNormSq = 0.0
    i = 0
    while (i < n) { vNormSq += v(i) * v(i); i += 1 }
    val vNorm = math.sqrt(vNormSq)
    val out = new Array[Any](mat.length)
    var r = 0
    while (r < mat.length) {
      val row = mat(r)
      var dot = 0.0
      var j = 0
      while (j < n) { dot += v(j) * row(j); j += 1 }
      val denom = vNorm * rowNorms(r)
      out(r) = if (denom > 0) dot / denom else 0.0
      r += 1
    }
    new GenericArrayData(out)
  }

  /** DotPairExpr kernel: HOF-parity dot product — for float arrays each
    * product is computed IN FLOAT then widened (exactly what
    * `aggregate(zip_with(a, b, _ * _), 0.0d, _ + _)` evaluates, and what
    * the DuckDB oracles mirror as `sum(CAST(x * y AS DOUBLE))`); double
    * arrays multiply in double. Fails fast on length mismatch. */
  def dotPair(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"dot: vectors have ${n} and ${b.numElements()} dims")
    var dot = 0.0
    var i = 0
    if (aFloat && bFloat) {
      // both float: product in FLOAT then widened — zip_with parity
      while (i < n) { dot += (a.getFloat(i) * b.getFloat(i)).toDouble; i += 1 }
    } else {
      // mixed or double: the implicit cast promoted floats to double
      // BEFORE the multiply — widen per side, multiply in double
      while (i < n) {
        val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
        val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
        dot += x * y
        i += 1
      }
    }
    dot
  }

  /** CosinePairExpr kernel: dot / (norm * norm); each side's norm uses
    * that side's own product semantics (float side: float squares widened
    * after the multiply — exactly `sqrt(dot(x, x))` of the HOF form);
    * 0.0 when either norm is zero. */
  def cosinePair(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): Double = {
    val n = a.numElements()
    if (n != b.numElements()) throw new IllegalArgumentException(
      s"cosine: vectors have ${n} and ${b.numElements()} dims")
    val dot = dotPair(a, b, aFloat, bFloat)
    var na = 0.0; var nb = 0.0
    var i = 0
    while (i < n) {
      if (aFloat) { val x = a.getFloat(i); na += (x * x).toDouble }
      else { val x = a.getDouble(i); na += x * x }
      if (bFloat) { val y = b.getFloat(i); nb += (y * y).toDouble }
      else { val y = b.getDouble(i); nb += y * y }
      i += 1
    }
    val d = math.sqrt(na) * math.sqrt(nb)
    if (d > 0) dot / d else 0.0
  }

  /** SignBitsExpr kernel: bit i set iff element i >= 0 (first 64). */
  def signBits(arr: ArrayData): Long = {
    var bits = 0L
    var i = 0
    val n = math.min(arr.numElements(), 64)
    while (i < n) { if (arr.getDouble(i) >= 0) bits |= (1L << i); i += 1 }
    bits
  }

  /** ArgMaxExpr kernel: index of the maximum element (first on ties). */
  def argMax(arr: ArrayData): Int = {
    var best = 0; var bestV = Double.NegativeInfinity
    var i = 0
    while (i < arr.numElements()) {
      val v = arr.getDouble(i)
      if (v > bestV) { bestV = v; best = i }
      i += 1
    }
    best
  }

  /** TopKIndicesExpr kernel: indices of the k largest elements, descending
    * (ties by lower index; all-NaN tail taken by lowest index). */
  def topKIndices(arr: ArrayData, k: Int): ArrayData = {
    val n = arr.numElements()
    val taken = new Array[Boolean](n)
    val kk = math.min(k, n)
    val out = new Array[Any](kk)
    var r = 0
    while (r < kk) {
      var best = -1; var bestV = Double.NegativeInfinity
      var i = 0
      while (i < n) {
        if (!taken(i)) { val v = arr.getDouble(i); if (v > bestV) { bestV = v; best = i } }
        i += 1
      }
      if (best < 0) {
        // all remaining elements are NaN (NaN > -Inf is false): take the
        // lowest untaken index deterministically instead of crashing
        var i2 = 0
        while (best < 0 && i2 < n) { if (!taken(i2)) best = i2; i2 += 1 }
      }
      taken(best) = true
      out(r) = best
      r += 1
    }
    new GenericArrayData(out)
  }

  /** ZOrderExpr kernel: Morton interleave of the low 32 bits of x (even
    * bit positions) and y (odd positions). Bit spread via the public
    * binary-magic-numbers sequence (Stanford Bit Twiddling Hacks). */
  def zorder2(x: Long, y: Long): Long =
    spreadBits(x & 0xFFFFFFFFL) | (spreadBits(y & 0xFFFFFFFFL) << 1)

  private def spreadBits(v: Long): Long = {
    var x = v
    x = (x | (x << 16)) & 0x0000FFFF0000FFFFL
    x = (x | (x << 8)) & 0x00FF00FF00FF00FFL
    x = (x | (x << 4)) & 0x0F0F0F0F0F0F0F0FL
    x = (x | (x << 2)) & 0x3333333333333333L
    x = (x | (x << 1)) & 0x5555555555555555L
    x
  }

  /** BPE end-of-word marker symbol. */
  val BpeEow = "</w>"

  /** Merge every leftmost-non-overlapping (a,b) adjacency in `syms` into
    * the single symbol a+b — the application step shared by BPE training
    * (driver, over the word-frequency head) and encoding (executor, per
    * row), so the two can never drift. Leftmost-non-overlapping matches
    * `String.replace(a+b, ...)` occurrence counting, which is what makes
    * fixed-merge token counts SQL-replayable. */
  def bpeMergeAll(syms: java.util.ArrayList[String], a: String, b: String): Unit = {
    var j = 0
    while (j < syms.size - 1) {
      if (syms.get(j) == a && syms.get(j + 1) == b) {
        syms.set(j, a + b)
        syms.remove(j + 1)
      }
      j += 1
    }
  }

  /** BpeEncodeExpr kernel: lowercased alphanumeric-run words, each encoded
    * as char symbols + `</w>` with merges applied in rank order (the
    * lowest-rank adjacent pair present merges next — exactly the order
    * training learned them). */
  def bpeEncode(raw: String, table: BpeTable): ArrayData = {
    val text = raw.toLowerCase(java.util.Locale.ROOT)
    val out = new mutable.ArrayBuffer[Any]
    val word = new java.lang.StringBuilder
    var i = 0
    while (i <= text.length) {
      val alnum = i < text.length && {
        val ch = text.charAt(i)
        (ch >= 'a' && ch <= 'z') || (ch >= '0' && ch <= '9')
      }
      if (alnum) word.append(text.charAt(i))
      else if (word.length > 0) {
        val toks = bpeEncodeWord(word.toString, table)
        var k = 0
        while (k < toks.length) { out += UTF8String.fromString(toks(k)); k += 1 }
        word.setLength(0)
      }
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  private def bpeEncodeWord(w: String, table: BpeTable): Array[String] = {
    val hit = table.cached(w)
    if (hit != null) return hit
    val syms = new java.util.ArrayList[String](w.length + 1)
    var i = 0
    while (i < w.length) { syms.add(String.valueOf(w.charAt(i))); i += 1 }
    syms.add(BpeEow)
    var done = false
    while (!done) {
      var best = Int.MaxValue
      var j = 0
      while (j < syms.size - 1) {
        val r = table.rank(syms.get(j), syms.get(j + 1))
        if (r < best) best = r
        j += 1
      }
      if (best == Int.MaxValue) done = true
      else {
        val (a, b) = table.pair(best)
        bpeMergeAll(syms, a, b)
      }
    }
    val arr = syms.toArray(new Array[String](syms.size))
    table.cache(w, arr)
    arr
  }
}
