package graft.util

import org.scalatest.funsuite.AnyFunSuite

/** Contract of the job-entry argument parser (reference behavior:
  * scio Args — properties, flags, quoted-comma splitting, typed
  * accessors, loud errors).
  */
class ArgsSpec extends AnyFunSuite {

  test("properties, flags, repeats, and the required/optional/list accessors") {
    val a = Args(Array("--in=gs://x", "--n=5", "--tag=a,b", "--tag=c", "--dry"))
    assert(a("in") == "gs://x")
    assert(a.required("in") == "gs://x")
    assert(a.int("n") == 5 && a.long("n") == 5L)
    assert(a.list("tag") == List("a", "b", "c"))
    assert(a.optional("missing").isEmpty)
    assert(a.getOrElse("missing", "dflt") == "dflt")
    assert(a.boolean("dry") && a.boolean("verbose", default = false) === false)
    intercept[IllegalArgumentException](a.required("missing"))
    intercept[IllegalArgumentException](a.required("tag")) // repeated
    intercept[IllegalArgumentException](a.optional("tag"))
    intercept[IllegalArgumentException](a.int("in")) // not a number
  }

  test("comma splitting respects double quotes") {
    val a = Args(Array("--q=\"a,b\",c", "--plain=x,y"))
    assert(a.list("q") == List("\"a,b\"", "c"))
    assert(a.list("plain") == List("x", "y"))
  }

  test("typed accessors with defaults; float/double/boolean parsing") {
    val a = Args(Array("--f=1.5", "--d=2.25", "--b=TRUE"))
    assert(a.float("f") == 1.5f && a.float("g", 9.0f) == 9.0f)
    assert(a.double("d") == 2.25 && a.double("e", 7.0) == 7.0)
    assert(a.boolean("b") && !a.boolean("c", default = false))
    intercept[IllegalArgumentException](Args(Array("--b=yes")).boolean("b"))
  }

  test("malformed arguments fail loudly") {
    intercept[IllegalArgumentException](Args(Array("positional")))
    intercept[IllegalArgumentException](Args(Array("-x=1")))
    // the same key as both flag and property conflicts
    intercept[IllegalArgumentException](Args(Array("--k", "--k=v")))
  }

  test("toString is sorted and stable; equality is by content") {
    val a = Args(Array("--b=2", "--a=1", "--m=x,y"))
    assert(a.toString == "Args(--a=1, --b=2, --m=[x, y])")
    assert(a == Args(Array("--a=1", "--b=2", "--m=x,y")))
    assert(a != Args(Array("--a=1")))
  }

  test("value containing '=' splits on the first '=' only") {
    val a = Args(Array("--expr=x=y+1"))
    assert(a("expr") == "x=y+1")
  }

  test("contextAndArgs: scio's ContextAndArgs entry — session config split from job args") {
    // force the suite's shared session FIRST so getOrCreate reuses it
    // (a fresh local[2] here would otherwise become the active session
    // for every later suite) — the point is the arg split, not a
    // second JVM session
    graft.TestSpark.spark
    val (session, args) = graft.GraftSession.contextAndArgs(
      Array("--master=local[2]", "--input=/data/in", "--n=3", "--dry"))
    assert(session.sparkContext.appName.nonEmpty)
    assert(args("input") == "/data/in" && args.int("n") == 3 && args.boolean("dry"))
  }
}
