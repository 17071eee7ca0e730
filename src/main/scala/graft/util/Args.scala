package graft.util

/** Command-line argument parsing for graft jobs — the entry-point
  * convenience every reference job starts from (reference behavior:
  * scio-core/src/main/scala/com/spotify/scio/Args.scala — `--key=v1,
  * v2` properties and `--flag` booleans with typed accessors).
  * Independent implementation of the same contract:
  *
  *   - every argument must start with `--`;
  *   - `--key=value` declares a property; the value splits on commas
  *     EXCEPT inside double quotes (`--q="a,b",c` → `List("a,b", c)`);
  *   - a repeated key accumulates values in argument order;
  *   - `--flag` (no `=`) is the boolean true; mixing flag and
  *     property forms of one key is an error;
  *   - `required`/`apply` demand exactly one value, `optional` allows
  *     zero-or-one, `list` returns all; typed accessors (`int`,
  *     `long`, `float`, `double`, `boolean`) parse with a clear error
  *     naming the key.
  */
final class Args private (private val m: Map[String, List[String]])
  extends Serializable {

  def asMap: Map[String, List[String]] = m

  /** Exactly-one value (error when absent or repeated). */
  def required(key: String): String = list(key) match {
    case v :: Nil => v
    case Nil => throw new IllegalArgumentException(s"Missing value for property '$key'")
    case _ => throw new IllegalArgumentException(s"Multiple values for property '$key'")
  }

  /** Shortcut for [[required]]. */
  def apply(key: String): String = required(key)

  /** Zero-or-one value (error when repeated). */
  def optional(key: String): Option[String] = list(key) match {
    case Nil => None
    case v :: Nil => Some(v)
    case _ => throw new IllegalArgumentException(s"Multiple values for property '$key'")
  }

  def getOrElse(key: String, default: => String): String =
    optional(key).getOrElse(default)

  /** Every value for the key (Nil when absent). */
  def list(key: String): List[String] = m.getOrElse(key, Nil)

  private def typed[T](key: String, parse: String => T): T =
    typedOpt(key, parse).getOrElse(
      throw new IllegalArgumentException(s"Missing value for property '$key'"))

  private def typedOpt[T](key: String, parse: String => T): Option[T] =
    optional(key).map { v =>
      try parse(v)
      catch {
        case scala.util.control.NonFatal(_) =>
          throw new IllegalArgumentException(s"Invalid value '$v' for '$key'")
      }
    }

  def int(key: String): Int = typed(key, _.toInt)
  def int(key: String, default: Int): Int = typedOpt(key, _.toInt).getOrElse(default)
  def long(key: String): Long = typed(key, _.toLong)
  def long(key: String, default: Long): Long = typedOpt(key, _.toLong).getOrElse(default)
  def float(key: String): Float = typed(key, _.toFloat)
  def float(key: String, default: Float): Float =
    typedOpt(key, _.toFloat).getOrElse(default)
  def double(key: String): Double = typed(key, _.toDouble)
  def double(key: String, default: Double): Double =
    typedOpt(key, _.toDouble).getOrElse(default)
  def boolean(key: String): Boolean = typed(key, parseBool(key, _))
  def boolean(key: String, default: Boolean): Boolean =
    typedOpt(key, parseBool(key, _)).getOrElse(default)

  private def parseBool(key: String, v: String): Boolean = v.toLowerCase match {
    case "true" => true
    case "false" => false
    case _ => throw new IllegalArgumentException(s"Invalid value '$v' for '$key'")
  }

  override def toString: String =
    m.keys.toArray.sorted.map { k =>
      val vs = m(k) match {
        case v :: Nil => v
        case many => many.mkString("[", ", ", "]")
      }
      s"--$k=$vs"
    }.mkString("Args(", ", ", ")")

  override def equals(obj: Any): Boolean = obj match {
    case that: Args => this.m == that.m
    case _ => false
  }
  override def hashCode(): Int = m.hashCode()
}

object Args {

  def apply(args: Array[String]): Args = {
    val stripped = args.map { a =>
      require(a.startsWith("--"), s"Argument '$a' does not begin with '--'")
      a.substring(2)
    }
    val (props, flags) = stripped.partition(_.contains("="))
    val propMap: Map[String, List[String]] = props.toList
      .map { s =>
        val i = s.indexOf('=')
        (s.substring(0, i), splitRespectingQuotes(s.substring(i + 1)))
      }
      .groupBy(_._1)
      .map { case (k, kvs) => k -> kvs.flatMap(_._2) }
    val flagMap: Map[String, List[String]] =
      flags.map(_ -> List("true")).toMap
    val clash = propMap.keySet.intersect(flagMap.keySet)
    require(clash.isEmpty,
      s"Conflicting boolean and property '${clash.mkString(", ")}'")
    new Args(propMap ++ flagMap)
  }

  /** Split on commas that sit OUTSIDE double-quoted sections: scan
    * once tracking quote parity; quotes are preserved verbatim in the
    * emitted values (callers strip them if they care).
    */
  private[util] def splitRespectingQuotes(v: String): List[String] = {
    val out = List.newBuilder[String]
    val cur = new StringBuilder
    var inQuote = false
    v.foreach {
      case '"' => inQuote = !inQuote; cur += '"'
      case ',' if !inQuote => out += cur.result(); cur.clear()
      case c => cur += c
    }
    out += cur.result()
    out.result()
  }
}
