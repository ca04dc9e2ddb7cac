package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftshim.ColumnBridge
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType, IntegerType}
import org.apache.spark.unsafe.types.UTF8String

/** Tight-loop replacements for the interpreted higher-order-function
  * pipelines in the vector/set hot paths. Semantics are BIT-IDENTICAL
  * to the `zip_with`+`aggregate` / `array_intersect`+`array_union`
  * formulations they replace (same element order, same left-to-right
  * double accumulation, same distinct-set counting), so oracle-checked
  * outputs do not move; only the constant factor does (no per-element
  * lambda dispatch, no intermediate arrays).
  */

/** Σ aᵢ·bᵢ in double, left-to-right. Accepts float or double arrays on
  * either side (floats widened exactly). Evaluates over min length —
  * callers guarantee equal-length vectors.
  *
  * Codegen emits a call to the static kernel, so the surrounding
  * projection stays inside whole-stage codegen (no interpreted-eval
  * boundary in the hot path). */
case class ArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "array_dot"

  private def isFloat(e: Expression): Boolean = e.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val leftFloat = isFloat(left)
  @transient private lazy val rightFloat = isFloat(right)

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Double.valueOf(ArrayDot.compute(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData], leftFloat, rightFloat))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.ArrayDot.compute($a, $b, $leftFloat, $rightFloat);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object ArrayDot {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(a: ArrayData, b: ArrayData, leftFloat: Boolean,
      rightFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) {
      val x = if (leftFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (rightFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }
}

/** Jaccard similarity of two arrays (string or long elements) as
  * distinct sets: |A∩B| / |A∪B| in double — identical to
  * size(array_intersect(a,b)) / size(array_union(a,b)). */
case class JaccardSim(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = DoubleType
  override def prettyName: String = "jaccard_sim"
  override def nullable: Boolean = true

  @transient private lazy val isLong = left.dataType match {
    case ArrayType(org.apache.spark.sql.types.LongType, _) => true
    case _ => false
  }

  override def nullSafeEval(l: Any, r: Any): Any = {
    val v = JaccardSim.compute(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData], isLong)
    if (v.isNaN) null else java.lang.Double.valueOf(v)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => s"""
      ${ev.value} = graft.functions.JaccardSim.compute($a, $b, $isLong);
      if (Double.isNaN(${ev.value})) { ${ev.isNull} = true; }""")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object JaccardSim {
  /** Static kernel; NaN encodes the empty-union NULL case. Long arrays
    * that arrive ascending-sorted (ShingleHashes emits them that way)
    * take a zero-allocation linear merge; anything else falls back to
    * the hash-set path. Both count DISTINCT elements — identical
    * results. */
  def compute(a: ArrayData, b: ArrayData, isLong: Boolean): Double = {
    if (isLong && isSortedAsc(a) && isSortedAsc(b))
      return mergeJaccard(a, b)
    hashJaccard(a, b, isLong)
  }

  private def isSortedAsc(a: ArrayData): Boolean = {
    val n = a.numElements()
    var i = 1
    while (i < n) {
      if (a.getLong(i - 1) > a.getLong(i)) return false
      i += 1
    }
    true
  }

  /** Distinct-set Jaccard by merging two ascending arrays. Duplicates
    * within an input are counted once (matching array_intersect /
    * array_union semantics). */
  private def mergeJaccard(a: ArrayData, b: ArrayData): Double = {
    val na = a.numElements()
    val nb = b.numElements()
    var i = 0
    var j = 0
    var inter = 0
    var union = 0
    var havePrev = false
    var prev = 0L
    @inline def fresh(v: Long): Boolean = {
      val f = !havePrev || v != prev
      if (f) { prev = v; havePrev = true }
      f
    }
    while (i < na && j < nb) {
      val x = a.getLong(i)
      val y = b.getLong(j)
      if (x == y) {
        if (fresh(x)) { union += 1; inter += 1 }
        i += 1; j += 1
      } else if (x < y) {
        if (fresh(x)) union += 1
        i += 1
      } else {
        if (fresh(y)) union += 1
        j += 1
      }
    }
    while (i < na) { if (fresh(a.getLong(i))) union += 1; i += 1 }
    while (j < nb) { if (fresh(b.getLong(j))) union += 1; j += 1 }
    if (union == 0) Double.NaN else inter.toDouble / union.toDouble
  }

  private def hashJaccard(a: ArrayData, b: ArrayData,
      isLong: Boolean): Double = {
    val setA = new java.util.HashSet[Any](a.numElements() * 2)
    var i = 0
    while (i < a.numElements()) {
      setA.add(if (isLong) java.lang.Long.valueOf(a.getLong(i))
        else a.getUTF8String(i))
      i += 1
    }
    val setB = new java.util.HashSet[Any](b.numElements() * 2)
    var inter = 0
    i = 0
    while (i < b.numElements()) {
      val s = if (isLong) java.lang.Long.valueOf(b.getLong(i))
        else b.getUTF8String(i)
      if (setB.add(s) && setA.contains(s)) inter += 1
      i += 1
    }
    val union = setA.size + setB.size - inter
    if (union == 0) Double.NaN
    else inter.toDouble / union.toDouble
  }
}

/** argmax_c Σᵢ vecᵢ·centroid(c)ᵢ with first-max tie-break — the fused
  * form of `array_position(dots, array_max(dots)) - 1` over
  * `array(dot(vec, c₀) … dot(vec, c_C))`, which materializes a dots
  * array and re-reads the row vector per centroid. This kernel copies
  * the vector ONCE into a local double[] and scans the centroid matrix
  * linearly. Bit-identical: each per-centroid dot is the same
  * left-to-right double accumulation as ArrayDot, `>` keeps the first
  * maximum exactly like array_position (SimilaritySpec pins fused ≡
  * composed). Centroids are a flat row-major [c][i] Seq so expression
  * equality stays structural. */
case class NearestCentroid(child: Expression, centroids: Seq[Double],
    dims: Int) extends UnaryExpression {

  require(dims > 0 && centroids.nonEmpty && centroids.length % dims == 0,
    "centroids must be a non-empty flat [c][i] matrix of dims-wide rows")
  override def dataType: DataType = IntegerType
  override def prettyName: String = "nearest_centroid"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }
  @transient private lazy val flat: Array[Double] = centroids.toArray

  override def nullSafeEval(input: Any): Any =
    java.lang.Integer.valueOf(NearestCentroid.compute(
      input.asInstanceOf[ArrayData], flat, dims, isFloat))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("centroidMatrix", flat, "double[]")
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.NearestCentroid.compute($c, $ref,
        $dims, $isFloat);""")
  }

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object NearestCentroid {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(v: ArrayData, cents: Array[Double], dims: Int,
      isFloat: Boolean): Int = {
    // ArrayDot evaluates over min length; mirror it
    val n = math.min(dims, v.numElements())
    val vec = new Array[Double](n)
    var i = 0
    while (i < n) {
      vec(i) = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      i += 1
    }
    val nlist = cents.length / dims
    var best = Double.NegativeInfinity
    var idx = 0
    var c = 0
    while (c < nlist) {
      var acc = 0.0
      val off = c * dims
      i = 0
      while (i < n) { acc += vec(i) * cents(off + i); i += 1 }
      if (acc > best) { best = acc; idx = c }
      c += 1
    }
    idx
  }
}

/** Per-vector symmetric int8 quantization: scale = max|vᵢ|/127, qᵢ =
  * clamp(⌊vᵢ/scale + 0.5⌋, -127, 127) (half-up rounding — `floor(x+0.5)`
  * is the same rule in Java and SQL, unlike `round`, whose negative-tie
  * behavior differs across engines). An all-zero vector quantizes to
  * zeros. Every step is IEEE-deterministic (exact float→double widening,
  * one divide, one add, floor), so the quantized codes — and any integer
  * arithmetic over them — are reproducible cross-engine: the 4×-smaller
  * ANN scan stays oracle-checkable.
  *
  * Scale story: at 100 TB of vectors the corpus scan is bandwidth-bound;
  * int8 codes cut the scanned bytes 4× and the dot kernel runs on ints.
  * The scale factor itself cancels out of cosine, so ranking needs no
  * dequantization at all. */
case class Int8Quantize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)
  override def prettyName: String = "int8_quantize"

  @transient private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def nullSafeEval(input: Any): Any =
    Int8Quantize.compute(input.asInstanceOf[ArrayData], isFloat)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.Int8Quantize.compute($c, $isFloat);")

  override protected def withNewChildInternal(c: Expression): Expression =
    copy(child = c)
}

object Int8Quantize {
  /** Static kernel shared by interpreted eval and generated code. */
  def compute(v: ArrayData, isFloat: Boolean): ArrayData = {
    val n = v.numElements()
    val vec = new Array[Double](n)
    var maxAbs = 0.0
    var i = 0
    while (i < n) {
      val x = if (isFloat) v.getFloat(i).toDouble else v.getDouble(i)
      vec(i) = x
      val a = math.abs(x)
      if (a > maxAbs) maxAbs = a
      i += 1
    }
    val out = new Array[Int](n)
    if (maxAbs != 0.0) {
      val scale = maxAbs / 127.0
      i = 0
      while (i < n) {
        val q = math.floor(vec(i) / scale + 0.5)
        out(i) = math.max(-127.0, math.min(127.0, q)).toInt
        i += 1
      }
    }
    org.apache.spark.sql.catalyst.expressions.UnsafeArrayData
      .fromPrimitiveArray(out)
  }
}

/** Σ aᵢ·bᵢ over two int arrays in 64-bit integer arithmetic —
  * overflow-free for int8 codes (64 dims × 127² ≪ 2⁶³) and exact, so
  * quantized dots/norms hash-match any engine. Evaluates over min
  * length, mirroring ArrayDot. */
case class IntArrayDot(left: Expression, right: Expression)
    extends BinaryExpression {

  override def dataType: DataType = org.apache.spark.sql.types.LongType
  override def prettyName: String = "int_array_dot"

  override def nullSafeEval(l: Any, r: Any): Any =
    java.lang.Long.valueOf(IntArrayDot.compute(l.asInstanceOf[ArrayData],
      r.asInstanceOf[ArrayData]))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.IntArrayDot.compute($a, $b);")

  override protected def withNewChildrenInternal(l: Expression,
      r: Expression): Expression = copy(left = l, right = r)
}

object IntArrayDot {
  def compute(a: ArrayData, b: ArrayData): Long = {
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) {
      acc += a.getInt(i).toLong * b.getInt(i).toLong
      i += 1
    }
    acc
  }
}

object ArrayFunctions {
  def arrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(ArrayDot(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def int8Quantize(vec: Column): Column =
    ColumnBridge.column(Int8Quantize(ColumnBridge.expression(vec)))

  def intArrayDot(a: Column, b: Column): Column =
    ColumnBridge.column(IntArrayDot(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def jaccardSim(a: Column, b: Column): Column =
    ColumnBridge.column(JaccardSim(ColumnBridge.expression(a),
      ColumnBridge.expression(b)))

  def nearestCentroid(vec: Column, centroids: Array[Array[Double]]): Column =
    ColumnBridge.column(NearestCentroid(ColumnBridge.expression(vec),
      centroids.flatten.toSeq, centroids.head.length))
}
