package graft.plans

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XXH64}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types._
import org.apache.spark.sql.graftbridge.ColumnBridge

/** Native Catalyst expressions for the embedding hot path.
  *
  * The HOF-composed vector math in `functions/VectorOps` is correct
  * but interpreted (higher-order functions don't participate in
  * whole-stage codegen and box per element). These expressions
  * implement the same math as tight primitive loops with `doGenCode`,
  * so an ANN scan over billions of vectors stays inside Tungsten.
  * This is decision (b) of SURVEY.md §7.4's custom-vs-built-in table:
  * a scalar `Expression` for the one genuinely hot kernel.
  *
  * Semantics match VectorOps bit-for-bit: elements cast to double,
  * left-to-right sequential accumulation.
  */
object VectorExpressions {

  /** Generated-code accessor reading element `i` of array `v` as a
    * double, switched on the array's element type. Any numeric element
    * type is supported natively — int8-quantized embeddings arrive as
    * array<int>, and reading them through the wrong ArrayData accessor
    * would yield garbage silently (same hazard
    * [[HyperplaneSignBits]] guards against).
    */
  private def elemToDouble(dt: DataType, arr: String, i: String): String = dt match {
    case DoubleType  => s"$arr.getDouble($i)"
    case FloatType   => s"(double) $arr.getFloat($i)"
    case LongType    => s"(double) $arr.getLong($i)"
    case IntegerType => s"(double) $arr.getInt($i)"
    case ShortType   => s"(double) $arr.getShort($i)"
    case ByteType    => s"(double) $arr.getByte($i)"
    case _           => throw new IllegalArgumentException(s"bad elem type $dt")
  }

  abstract class VectorFold extends BinaryExpression {
    override def dataType: DataType = DoubleType
    override def nullable: Boolean = true

    // Both sides must be numeric arrays; anything else fails at
    // ANALYSIS time instead of evaluating to garbage.
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      (left.dataType, right.dataType) match {
        case (ArrayType(le, _), ArrayType(re, _))
          if elemKind(le) >= 0 && elemKind(re) >= 0 =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case (l, r) =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"$prettyName requires two arrays of float/double/int/long/short/byte, " +
              s"got ${l.catalogString} and ${r.catalogString}")
      }

    protected def leftElem: DataType =
      left.dataType.asInstanceOf[ArrayType].elementType
    protected def rightElem: DataType =
      right.dataType.asInstanceOf[ArrayType].elementType

    protected def getD(a: ArrayData, i: Int, dt: DataType): Double = dt match {
      case DoubleType  => a.getDouble(i)
      case FloatType   => a.getFloat(i).toDouble
      case LongType    => a.getLong(i).toDouble
      case IntegerType => a.getInt(i).toDouble
      case ShortType   => a.getShort(i).toDouble
      case _           => a.getByte(i).toDouble
    }
  }

  /** Sequential dot product of two numeric arrays (null if lengths
    * differ, mirroring zip_with's strictness would pad — we reject
    * instead: length mismatch is a data bug worth surfacing).
    */
  case class DotProduct(left: Expression, right: Expression) extends VectorFold {

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) return null
      var acc = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) { acc += getD(a, i, leftElem) * getD(b, i, rightElem); i += 1 }
      acc
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val acc = ctx.freshName("acc")
        val la = elemToDouble(leftElem, a, i)
        val rb = elemToDouble(rightElem, b, i)
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $acc = 0.0;
           |  for (int $i = 0; $i < $n; $i++) { $acc += $la * $rb; }
           |  ${ev.value} = $acc;
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Cosine similarity = dot/(|a||b|); null on length mismatch or a
    * zero-norm side.
    */
  case class CosineSimilarity(left: Expression, right: Expression) extends VectorFold {

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      if (a.numElements() != b.numElements()) return null
      var dot = 0.0; var na = 0.0; var nb = 0.0
      var i = 0
      val n = a.numElements()
      while (i < n) {
        val x = getD(a, i, leftElem); val y = getD(b, i, rightElem)
        dot += x * y; na += x * x; nb += y * y; i += 1
      }
      if (na == 0.0 || nb == 0.0) null
      else dot / (math.sqrt(na) * math.sqrt(nb))
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i")
        val n = ctx.freshName("n")
        val dot = ctx.freshName("dot")
        val na = ctx.freshName("na")
        val nb = ctx.freshName("nb")
        val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        val la = elemToDouble(leftElem, a, i)
        val rb = elemToDouble(rightElem, b, i)
        s"""
           |int $n = $a.numElements();
           |if ($n != $b.numElements()) {
           |  ${ev.isNull} = true;
           |} else {
           |  double $dot = 0.0; double $na = 0.0; double $nb = 0.0;
           |  for (int $i = 0; $i < $n; $i++) {
           |    double $x = $la; double $y = $rb;
           |    $dot += $x * $y; $na += $x * $x; $nb += $y * $y;
           |  }
           |  if ($na == 0.0 || $nb == 0.0) {
           |    ${ev.isNull} = true;
           |  } else {
           |    ${ev.value} = $dot / (java.lang.Math.sqrt($na) * java.lang.Math.sqrt($nb));
           |  }
           |}
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** Count of common elements between two SORTED long arrays (distinct
    * elements assumed, as array_sort(array_distinct(...)) produces) —
    * linear merge in generated code. The builtin array_intersect
    * builds a hash set per invocation in interpreted evaluation, which
    * dominates pairwise Jaccard verification at scale.
    */
  case class SortedIntersectCount(left: Expression, right: Expression)
      extends BinaryExpression {
    override def dataType: DataType = IntegerType
    override def nullable: Boolean = true

    override def nullSafeEval(l: Any, r: Any): Any = {
      val a = l.asInstanceOf[ArrayData]
      val b = r.asInstanceOf[ArrayData]
      var i = 0; var j = 0; var c = 0
      val n = a.numElements(); val m = b.numElements()
      while (i < n && j < m) {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x == y) { c += 1; i += 1; j += 1 }
        else if (x < y) i += 1
        else j += 1
      }
      c
    }

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, (a, b) => {
        val i = ctx.freshName("i"); val j = ctx.freshName("j")
        val c = ctx.freshName("c"); val n = ctx.freshName("n")
        val m = ctx.freshName("m"); val x = ctx.freshName("x")
        val y = ctx.freshName("y")
        s"""
           |int $i = 0, $j = 0, $c = 0;
           |int $n = $a.numElements(), $m = $b.numElements();
           |while ($i < $n && $j < $m) {
           |  long $x = $a.getLong($i); long $y = $b.getLong($j);
           |  if ($x == $y) { $c++; $i++; $j++; }
           |  else if ($x < $y) $i++; else $j++;
           |}
           |${ev.value} = $c;
         """.stripMargin
      })

    override protected def withNewChildrenInternal(
        newLeft: Expression, newRight: Expression): Expression =
      copy(left = newLeft, right = newRight)
  }

  /** All `planes` random-hyperplane sign bits of a vector in ONE
    * compiled pass — the LSH bucket id used by `Similarity.lshBuckets`.
    *
    * Bit-identical to the HOF form it replaced
    * (`Similarity.lshBucketsHof`, pinned by VectorPropertySpec): for
    * plane p the hyperplane component at dim i is
    * `pmod(xxhash64(lit(table*4096+p), i), 2000)/1000.0 - 1.0` —
    * multi-arg xxhash64 folds the INT plane literal into seed 42 first
    * (`XXH64.hashInt(plane, 42)`), then the INT index
    * (`XXH64.hashInt(i, seed_p)`) — and the projection accumulates
    * x_i·c_i left-to-right in double, exactly like
    * `aggregate(zip_with(...))`. Degenerate inputs both land in bucket
    * 0, matching the HOF form: a vector with ANY null element nulls
    * every projection (each sign-bit `when` falls to otherwise(0)),
    * and an EMPTY vector nulls them too (`sequence(0, size-1)` on size
    * 0 yields the DESCENDING [0,-1], so zip_with null-pads).
    *
    * Why native: the HOF form evaluates `planes` interpreted
    * aggregate(zip_with(...)) towers per row — 2 boxed lambda calls
    * per (plane, element), with the hash recomputed inside. This is an
    * unboxed elements×planes loop with per-plane seeds precomputed
    * once per (table, planes). ANN bucketing touches every corpus
    * vector, so this is the indexing hot path at 100 TB.
    */
  case class HyperplaneSignBits(child: Expression, planes: Int, table: Int)
      extends UnaryExpression {
    require(planes >= 1 && planes <= 62, s"planes out of range: $planes")

    override def dataType: DataType = LongType
    override def nullable: Boolean = true

    // Any numeric element type is accepted and read natively (the HOF
    // form cast to double first — elemKind reproduces that cast, so
    // int/long arrays bucket bit-identically). Everything else fails
    // at ANALYSIS time: without this guard a non-float array would be
    // read through the wrong ArrayData accessor and yield garbage
    // bucket ids silently.
    override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
      child.dataType match {
        case ArrayType(et, _) if VectorExpressions.elemKind(et) >= 0 =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
        case other =>
          org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
            s"hyperplane_bits requires array of float/double/int/long/short/byte, " +
              s"got ${other.catalogString} (cast decimal/string arrays explicitly)")
      }

    private lazy val kind =
      VectorExpressions.elemKind(child.dataType.asInstanceOf[ArrayType].elementType)

    override def nullSafeEval(input: Any): Any =
      VectorExpressions.hyperplaneSignBits(
        input.asInstanceOf[ArrayData], kind, planes, table)

    override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
      nullSafeCodeGen(ctx, ev, c => s"""
        ${ev.value} = graft.plans.VectorExpressions.hyperplaneSignBits(
          $c, $kind, $planes, $table);
      """)

    override protected def withNewChildInternal(newChild: Expression): Expression =
      copy(child = newChild)
  }

  /** Element accessor kind for [[HyperplaneSignBits]]; -1 = unsupported. */
  private[plans] def elemKind(et: DataType): Int = et match {
    case DoubleType  => 0
    case FloatType   => 1
    case LongType    => 2
    case IntegerType => 3
    case ShortType   => 4
    case ByteType    => 5
    case _           => -1
  }

  /** Per-(table, planes) hyperplane seeds: seed_p = hashInt(plane, 42)
    * where plane = table*4096 + p (the plane-id spacing that keeps
    * multi-table plane sets independent).
    */
  private val planeSeedCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int), Array[Long]]()
  private def planeSeeds(table: Int, planes: Int): Array[Long] =
    planeSeedCache.computeIfAbsent((table, planes), { case (t, n) =>
      val out = new Array[Long](n)
      var p = 0
      while (p < n) { out(p) = XXH64.hashInt(t * 4096 + p, 42L); p += 1 }
      out
    })

  /** Static kernel shared by eval and generated code. `elemKind` is
    * the [[elemKind]] code of the array's element type.
    */
  def hyperplaneSignBits(v: ArrayData, elemKind: Int,
                         planes: Int, table: Int): Long = {
    val n = v.numElements()
    if (n == 0) return 0L // HOF: sequence(0,-1) null-pads => projections null => bucket 0
    val seeds = planeSeeds(table, planes)
    val acc = new Array[Double](planes)
    var i = 0
    while (i < n) {
      if (v.isNullAt(i)) return 0L // HOF: null element => all projections null => bucket 0
      val x = elemKind match {
        case 0 => v.getDouble(i)
        case 1 => v.getFloat(i).toDouble
        case 2 => v.getLong(i).toDouble
        case 3 => v.getInt(i).toDouble
        case 4 => v.getShort(i).toDouble
        case _ => v.getByte(i).toDouble
      }
      var p = 0
      while (p < planes) {
        val h = XXH64.hashInt(i, seeds(p))
        val pm = ((h % 2000L) + 2000L) % 2000L
        acc(p) += x * (pm.toDouble / 1000.0 - 1.0)
        p += 1
      }
      i += 1
    }
    var bits = 0L
    var p = 0
    while (p < planes) { if (acc(p) >= 0) bits |= 1L << p; p += 1 }
    bits
  }

  // Column-level API (Spark 4: Column <-> Expression via the bridge)
  def dot(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def cosine(a: Column, b: Column): Column =
    ColumnBridge.column(CosineSimilarity(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def sortedIntersectCount(a: Column, b: Column): Column =
    ColumnBridge.column(SortedIntersectCount(
      ColumnBridge.expression(a), ColumnBridge.expression(b)))
  def hyperplaneBits(vec: Column, planes: Int, table: Int = 0): Column =
    ColumnBridge.column(
      HyperplaneSignBits(ColumnBridge.expression(vec), planes, table))
}
