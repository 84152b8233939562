package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graftbridge.ColumnBridge
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.types._

/** Native sign-sketch (random-hyperplane LSH) signatures: for band b,
  * bit i = [v · h_{b·r+i} >= 0], hyperplanes from the md5-seeded ±1
  * family shared with `Similarity.planeSign` / the DuckDB oracle.
  * Returns array<long> of `bands` signatures.
  *
  * Exists because the declarative form — `aggregate(zip_with(...))`
  * folds over a planes×dims literal matrix — runs as interpreted
  * higher-order functions with a per-plane intermediate array
  * allocation: measured ~3 ms/row at 4 bands × 12 planes × 64 dims,
  * which turned q_embed_neardup's signature step into the sf1
  * bottleneck. This expression is one tight primitive loop per row
  * (dense sign matrix hoisted into a field), codegen'd via a static
  * call so it stays inside whole-stage codegen. */
case class SignSketchExpression(child: Expression, bands: Int,
                                planesPerBand: Int, dims: Int)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "sign_sketch"

  // A null ELEMENT yields a NULL signature row (matching the
  // declarative fold, where a null element nulls the dot product and
  // the whole aggregate) — so the expression is nullable even over a
  // non-nullable array column. Vectors SHORTER than `dims` are
  // zero-padded (missing trailing components contribute 0 to every
  // plane dot product); longer vectors are truncated to `dims`.
  override def nullable: Boolean = true

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"sign_sketch needs array<float|double>, got $other")
    }

  override protected def withNewChildInternal(
      newChild: Expression): SignSketchExpression = copy(child = newChild)

  private lazy val isFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  // dense ±1 matrix, rows 0..bands*planesPerBand-1 (shared family)
  @transient private lazy val signs: Array[Array[Double]] =
    SignSketch.matrix(bands * planesPerBand, dims)

  override protected def nullSafeEval(input: Any): Any = {
    val sk = SignSketch.sketchArrayData(input.asInstanceOf[ArrayData],
      isFloat, dims, signs, bands, planesPerBand)
    if (sk == null) null else new GenericArrayData(sk)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signSketchSigns", signs,
      "double[][]")
    nullSafeCodeGen(ctx, ev, c => {
      val box = ctx.freshName("sig")
      s"""
         |long[] $box = graft.functions.SignSketch.sketchArrayData(
         |  $c, $isFloat, $dims, $signsRef, $bands, $planesPerBand);
         |if ($box == null) { ${ev.isNull} = true; }
         |else {
         |  ${ev.value} =
         |    new org.apache.spark.sql.catalyst.util.GenericArrayData($box);
         |}
       """.stripMargin
    })
  }
}

object SignSketch {
  /** ±1 plane component, identical to Similarity.planeSign (md5 of
    * "p:d", sign of the first digest bit). */
  def sign(p: Int, d: Int): Double = {
    val dig = java.security.MessageDigest.getInstance("MD5")
      .digest(s"$p:$d".getBytes("UTF-8"))
    if ((dig(0) & 0x80) != 0) 1.0 else -1.0
  }

  def matrix(planes: Int, dims: Int): Array[Array[Double]] =
    Array.tabulate(planes, dims)((p, d) => sign(p, d))

  /** Copy an ArrayData into a dense vector (zero-padded past its
    * length, truncated past `dims`) and sketch it; returns null when
    * any read element is null — the declarative fold's semantics.
    * Called from both interpreted eval and generated code. */
  def sketchArrayData(arr: ArrayData, isFloat: Boolean, dims: Int,
                      signs: Array[Array[Double]], bands: Int,
                      r: Int): Array[Long] = {
    val n = math.min(arr.numElements(), dims)
    val v = new Array[Double](n)
    var d = 0
    while (d < n) {
      if (arr.isNullAt(d)) return null
      v(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    sketch(v, signs, bands, r)
  }

  /** All band signatures in one pass; called from generated code. */
  def sketch(v: Array[Double], signs: Array[Array[Double]],
             bands: Int, r: Int): Array[Long] = {
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var sig = 0L
      var i = 0
      while (i < r) {
        val plane = signs(b * r + i)
        var dot = 0.0
        var d = 0
        val n = math.min(v.length, plane.length)
        while (d < n) { dot += v(d) * plane(d); d += 1 }
        if (dot >= 0) sig |= (1L << i)
        i += 1
      }
      out(b) = sig
      b += 1
    }
    out
  }

  /** Column API: array<long> of band signatures. */
  def bandSignatures(vec: Column, bands: Int, planesPerBand: Int,
                     dims: Int): Column =
    ColumnBridge.column(SignSketchExpression(
      ColumnBridge.expression(vec), bands, planesPerBand, dims))
}
