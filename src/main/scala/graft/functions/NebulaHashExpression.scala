package graft.functions

import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expression for the reference's `hash()` builtin
  * (FunctionManager.cpp "hash" via std::hash<Value>): dispatches on
  * the child's RESOLVED type — identity on integral values, 0/1 on
  * booleans, MurmurHash2 of the little-endian bit pattern on floats,
  * MurmurHash2 of the UTF-8 bytes on strings. A plain Column helper
  * can't do this (a Column has no type before analysis), and a typed
  * UDF would pin one input type — this was the round-4 hash(int_col)
  * divergence (murmur-of-decimal-string instead of the int itself).
  *
  * Codegen'd (doGenCode below) so hash() stays inside whole-stage
  * codegen when it appears in a scan predicate. */
case class NebulaHashExpression(child: Expression) extends UnaryExpression {

  override def dataType: DataType = LongType
  override def prettyName: String = "nebula_hash"

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess

  override protected def withNewChildInternal(
      newChild: Expression): NebulaHashExpression = copy(child = newChild)

  override protected def nullSafeEval(input: Any): Any = child.dataType match {
    case LongType => input
    case IntegerType => input.asInstanceOf[Int].toLong
    case ShortType => input.asInstanceOf[Short].toLong
    case ByteType => input.asInstanceOf[Byte].toLong
    case BooleanType => if (input.asInstanceOf[Boolean]) 1L else 0L
    case DoubleType => NebulaHash.hash64(input.asInstanceOf[Double])
    case FloatType => NebulaHash.hash64(input.asInstanceOf[Float].toDouble)
    case StringType =>
      NebulaHash.hash64(input.asInstanceOf[UTF8String].getBytes)
    case _ => NebulaHash.hash64(input.toString)
  }

  override protected def doGenCode(ctx: CodegenContext,
                                   ev: ExprCode): ExprCode = {
    val f: String => String = child.dataType match {
      case LongType => c => c
      case IntegerType | ShortType | ByteType => c => s"(long) $c"
      case BooleanType => c => s"($c ? 1L : 0L)"
      case DoubleType =>
        c => s"graft.functions.NebulaHash.hash64((double) $c)"
      case FloatType =>
        c => s"graft.functions.NebulaHash.hash64((double) $c)"
      case StringType =>
        c => s"graft.functions.NebulaHash.hash64($c.getBytes())"
      case _ =>
        c => s"graft.functions.NebulaHash.hash64(String.valueOf($c))"
    }
    defineCodeGen(ctx, ev, f)
  }
}
