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
    val arr = input.asInstanceOf[ArrayData]
    val v = new Array[Double](math.min(arr.numElements(), dims))
    var d = 0
    while (d < v.length) {
      v(d) = if (isFloat) arr.getFloat(d).toDouble else arr.getDouble(d)
      d += 1
    }
    new GenericArrayData(SignSketch.sketch(v, signs, bands, planesPerBand))
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val signsRef = ctx.addReferenceObj("signSketchSigns", signs,
      "double[][]")
    val getter = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, c => {
      val v = ctx.freshName("vec")
      val d = ctx.freshName("d")
      s"""
         |int ${d}n = java.lang.Math.min($c.numElements(), $dims);
         |double[] $v = new double[${d}n];
         |for (int $d = 0; $d < ${d}n; $d++) {
         |  $v[$d] = (double) $c.$getter($d);
         |}
         |${ev.value} = new org.apache.spark.sql.catalyst.util.GenericArrayData(
         |  graft.functions.SignSketch.sketch($v, $signsRef, $bands, $planesPerBand));
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
