package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression, XXH64, XxHash64Function}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native MinHash signature over whitespace-token shingles — the
  * codegen form of the staged HOF pipeline in `Dedup.minhashLshPairs`
  * (tokens → xxhash64(token) → xxhash64(h₁..hₙ) shingle hashes →
  * per-permutation min of xxhash64(k, h)), bit-identical by
  * construction: the same tokenizer as [[TokenSimHash]] (regex-\s runs,
  * lowercase, empties dropped), Spark's XxHash64 with the builtin's
  * seed-chaining (multi-arg xxhash64 folds each value's hash into the
  * running seed, integer literals hash as ints), and min over exactly
  * the same shingle multiset.
  *
  * Why native: the HOF tower is interpreted per element — per row it
  * materializes a token array, a token-hash array, a shingle-hash array
  * and `perms` lambda evaluations per shingle, each boxing. This is one
  * compiled pass: a rolling window over token hashes and an unboxed
  * perms×shingles loop of XXH64.hashLong. Signature generation is the
  * dominant cost of the LSH pipeline at corpus scale (it touches every
  * byte of every document); everything downstream only sees the 64-long
  * signatures.
  *
  * Returns null when the document has fewer than `shingleN` tokens —
  * the same rows the pipeline's `size(tk) >= n` pre-filter drops.
  */
case class TokenMinHash(child: Expression, shingleN: Int, perms: Int)
    extends UnaryExpression {

  require(shingleN >= 1 && perms >= 1, "shingleN and perms must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenMinHash.signatureArray(
      input.asInstanceOf[UTF8String].toString, shingleN, perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.TokenMinHash.signatureArray(
        $c.toString(), $shingleN, $perms);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenMinHash {

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' || c == '\r'

  /** Per-permutation seeds: xxhash64(lit(k), h) chains the INT literal k
    * through the hash first — seed_k = hashInt(k, 42) — then folds the
    * shingle hash: hashLong(h, seed_k). Cached per perms count.
    */
  private val seedCache =
    new java.util.concurrent.ConcurrentHashMap[Int, Array[Long]]()
  private def seeds(perms: Int): Array[Long] =
    seedCache.computeIfAbsent(perms, p => {
      val out = new Array[Long](p)
      var k = 0
      while (k < p) { out(k) = XXH64.hashInt(k, 42L); k += 1 }
      out
    })

  /** Signature as a catalyst array, or null for < shingleN tokens. */
  def signatureArray(text: String, shingleN: Int, perms: Int): GenericArrayData = {
    val sig = signature(text, shingleN, perms)
    if (sig == null) null else new GenericArrayData(sig)
  }

  /** Signature as a long array, or null for < shingleN tokens. */
  def signature(text: String, shingleN: Int, perms: Int): Array[Long] = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val seedK = seeds(perms)
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    // rolling window of the last shingleN token hashes
    val ring = new Array[Long](shingleN)
    var nTokens = 0
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > start) {
        // same value as the xxhash64() builtin on this token string
        val th = XxHash64Function.hash(
          UTF8String.fromString(lower.substring(start, i)), StringType, 42L)
        ring(nTokens % shingleN) = th
        nTokens += 1
        if (nTokens >= shingleN) {
          // shingle hash = multi-arg xxhash64(h1..hn): fold into seed 42
          var h = 42L
          var o = nTokens - shingleN
          while (o < nTokens) {
            h = XXH64.hashLong(ring(o % shingleN), h)
            o += 1
          }
          var k = 0
          while (k < perms) {
            val m = XXH64.hashLong(h, seedK(k))
            if (m < out(k)) out(k) = m
            k += 1
          }
        }
      }
    }
    if (nTokens < shingleN) null else out
  }

  def apply(text: Column, shingleN: Int, perms: Int): Column =
    ColumnBridge.column(
      TokenMinHash(ColumnBridge.expression(text), shingleN, perms))
}
