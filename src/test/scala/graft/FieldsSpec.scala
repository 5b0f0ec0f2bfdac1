package graft

import org.scalatest.funsuite.AnyFunSuite
import graft.api.Fields

/** Port of the reference's tuple/fields algebra tests
  * (`backtype/storm/fields_test.clj`, `storm/trident/tuple_test.clj` —
  * SURVEY.md §5): ordered name lists, projection, duplicate rejection,
  * append-concatenation. */
class FieldsSpec extends AnyFunSuite {

  test("fieldIndex and contains follow declaration order") {
    val f = Fields("a", "b", "c")
    assert(f.size == 3)
    assert(f.fieldIndex("a") == 0 && f.fieldIndex("c") == 2)
    assert(f.contains("b") && !f.contains("z"))
    val e = intercept[IllegalArgumentException](f.fieldIndex("nope"))
    assert(e.getMessage.contains("does not exist"))
  }

  test("select projects values by name in requested order") {
    val f = Fields("a", "b", "c")
    assert(f.select(Fields("c", "a"), Seq(1, 2, 3)) == Seq(3, 1))
    assert(f.select(Fields(), Seq(1, 2, 3)) == Seq())
  }

  test("duplicate field names are rejected (Fields.java:28-46)") {
    val e = intercept[IllegalArgumentException](Fields("x", "y", "x"))
    assert(e.getMessage.contains("duplicate fields"))
  }

  test("concatenation appends (each-append semantics) and rejects collisions") {
    assert((Fields("a") ++ Fields("b", "c")).names == Seq("a", "b", "c"))
    intercept[IllegalArgumentException](Fields("a", "b") ++ Fields("b"))
  }
}
