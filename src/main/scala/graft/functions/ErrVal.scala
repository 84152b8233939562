package graft.functions

/** Typed-null sentinels (reference: src/common/datatypes/Value.h:37-46
  * NullType — the 8 error kinds a Value can carry). Spark columns are
  * statically typed, so an errored cell travels as a marked string in
  * an (otherwise string-rendered) result column; the TCK renderer
  * strips the prefix so cells compare against golden `BAD_TYPE` /
  * `BAD_DATA` / `UNKNOWN_PROP` text verbatim, with no NULL folding. */
object ErrVal {
  val Prefix = "__ERR__"
  val BadType: String = Prefix + "BAD_TYPE"
  val BadData: String = Prefix + "BAD_DATA"
  val UnknownProp: String = Prefix + "UNKNOWN_PROP"
  val DivByZero: String = Prefix + "DIV_BY_ZERO"
  val Overflow: String = Prefix + "ERR_OVERFLOW"
  val OutOfRange: String = Prefix + "OUT_OF_RANGE"

  def strip(s: String): String =
    if (s != null && s.startsWith(Prefix)) s.substring(Prefix.length) else s
  def isErr(s: String): Boolean = s != null && s.startsWith(Prefix)
}
