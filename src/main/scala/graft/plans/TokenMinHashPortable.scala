package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native form of the PORTABLE (md5) MinHash signature — the codegen
  * twin of the staged HOF pipeline
  * `Dedup.portableShingleHashes` + `Dedup.minhashFromHashesPortable`,
  * bit-identical by construction: the same tokenizer as
  * [[TokenMinHash]] (regex-\s runs, lowercase, empties dropped), the
  * shingle STRING (tokens space-joined) hashed with md5 and truncated
  * to its first 15 hex chars (60 bits) mod p = 2^31-1, then the
  * universal family h_k(x) = (a_k·x + b_k) mod p with a_k/b_k derived
  * from md5 of the permutation index exactly like the HOF form
  * (`a_k = md5("mha:k")[0:8] mod (p-2) + 1`,
  * `b_k = md5("mhb:k")[0:8] mod p`).
  *
  * Why native: same argument as [[TokenMinHash]] — the HOF tower is
  * interpreted and boxes per (permutation, shingle); here the md5 runs
  * once per shingle and the perms loop is unboxed multiply-mod. The
  * md5 itself (not the perms loop) dominates, which is the documented
  * price of engine-portability; interior passes should use
  * [[TokenMinHash]].
  *
  * Returns null when the document has fewer than `shingleN` tokens —
  * the same rows the HOF pipeline's `size(hs) >= 1` filter drops.
  */
case class TokenMinHashPortable(child: Expression, shingleN: Int, perms: Int)
    extends UnaryExpression {

  require(shingleN >= 1 && perms >= 1, "shingleN and perms must be positive")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def nullSafeEval(input: Any): Any =
    TokenMinHashPortable.signatureArray(
      input.asInstanceOf[UTF8String].toString, shingleN, perms)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.plans.TokenMinHashPortable.signatureArray(
        $c.toString(), $shingleN, $perms);
      if (${ev.value} == null) { ${ev.isNull} = true; }
    """)

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

object TokenMinHashPortable {

  val Prime = 2147483647L // 2^31 - 1, the HOF family's modulus

  private def isWs(c: Char): Boolean =
    c == ' ' || c == '\t' || c == '\n' || c == '' || c == '\f' ||
      c == '\r'

  private val mdLocal =
    ThreadLocal.withInitial[java.security.MessageDigest](() =>
      java.security.MessageDigest.getInstance("MD5"))

  /** First 8 md5 hex chars of a UTF-8 string as a long (= the first 4
    * digest bytes, unsigned) — the constant derivation the HOF
    * reference (`Dedup.md5Const`) and every md5-capable engine share.
    * Public: this is the single source of truth for the family's
    * constants.
    */
  def md5Head32(s: String): Long = {
    val d = mdLocal.get()
    d.reset()
    val b = d.digest(s.getBytes(java.nio.charset.StandardCharsets.UTF_8))
    ((b(0) & 0xffL) << 24) | ((b(1) & 0xffL) << 16) |
      ((b(2) & 0xffL) << 8) | (b(3) & 0xffL)
  }

  /** First 15 md5 hex chars of the raw bytes as a long (60 bits): the
    * first 7 digest bytes plus the HIGH nibble of the 8th — exactly
    * `('0x'||substr(md5(s),1,15))::BIGINT`.
    */
  private def md5Head60(bytes: Array[Byte], len: Int): Long = {
    val d = mdLocal.get()
    d.reset()
    d.update(bytes, 0, len)
    val b = d.digest()
    var v = 0L
    var i = 0
    while (i < 7) { v = (v << 8) | (b(i) & 0xffL); i += 1 }
    (v << 4) | ((b(7) & 0xffL) >>> 4)
  }

  /** (a_k, b_k) per permutation, cached per perms count. */
  private val constCache =
    new java.util.concurrent.ConcurrentHashMap[Int, (Array[Long], Array[Long])]()
  private def consts(perms: Int): (Array[Long], Array[Long]) =
    constCache.computeIfAbsent(perms, p => {
      val a = new Array[Long](p); val b = new Array[Long](p)
      var k = 0
      while (k < p) {
        a(k) = md5Head32(s"mha:$k") % (Prime - 2) + 1
        b(k) = md5Head32(s"mhb:$k") % Prime
        k += 1
      }
      (a, b)
    })

  /** Signature as a catalyst array, or null for < shingleN tokens. */
  def signatureArray(text: String, shingleN: Int, perms: Int): GenericArrayData = {
    val sig = signature(text, shingleN, perms)
    if (sig == null) null else new GenericArrayData(sig)
  }

  /** Signature as a long array, or null for < shingleN tokens. */
  def signature(text: String, shingleN: Int, perms: Int): Array[Long] = {
    val lower = text.toLowerCase(java.util.Locale.ROOT)
    val (ca, cb) = consts(perms)
    val out = new Array[Long](perms)
    java.util.Arrays.fill(out, Long.MaxValue)
    // rolling window of the last shingleN tokens, stored as UTF-8
    // BYTES (encoded once per token, not once per window membership);
    // the shingle string (space-joined) is assembled into a reused
    // buffer for the md5 — byte-identical to
    // md5(concat_ws(' ', slice(toks, ...)))
    val ring = new Array[Array[Byte]](shingleN)
    var buf = new Array[Byte](256)
    var nTokens = 0
    var i = 0
    val n = lower.length
    while (i < n) {
      while (i < n && isWs(lower.charAt(i))) i += 1
      val start = i
      while (i < n && !isWs(lower.charAt(i))) i += 1
      if (i > start) {
        ring(nTokens % shingleN) = lower.substring(start, i)
          .getBytes(java.nio.charset.StandardCharsets.UTF_8)
        nTokens += 1
        if (nTokens >= shingleN) {
          var len = 0
          var o = nTokens - shingleN
          while (o < nTokens) {
            if (o > nTokens - shingleN) {
              if (len == buf.length) buf = java.util.Arrays.copyOf(buf, len * 2)
              buf(len) = ' '.toByte; len += 1
            }
            val tb = ring(o % shingleN)
            if (len + tb.length > buf.length)
              buf = java.util.Arrays.copyOf(buf,
                math.max(buf.length * 2, len + tb.length))
            System.arraycopy(tb, 0, buf, len, tb.length)
            len += tb.length
            o += 1
          }
          val h = md5Head60(buf, len) % Prime
          var k = 0
          while (k < perms) {
            val m = (ca(k) * h + cb(k)) % Prime
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
      TokenMinHashPortable(ColumnBridge.expression(text), shingleN, perms))
}
