package graft.expr

import org.apache.spark.sql.Row
import org.scalatest.funsuite.AnyFunSuite

class GroupKeySpec extends AnyFunSuite {

  private def key(vals: Any*): String = GroupKey.of(Row(vals: _*), vals.indices)

  test("separator content cannot collide across field boundaries") {
    assert(key("a b", "c") != key("a", "b c"))
    assert(key("ab", "") != key("a", "b"))
    assert(key("1:a", "b") != key("1", ":ab"))
  }

  test("null is distinct from the string 'null' and from empty") {
    assert(key(null.asInstanceOf[String]) != key("null"))
    assert(key(null.asInstanceOf[String]) != key(""))
    assert(key(null, "x") != key("null", "x"))
  }

  test("equal tuples produce equal keys across types") {
    assert(key("AAPL", 7) == key("AAPL", 7))
    assert(key(1.5, "x") == key(1.5, "x"))
  }
}
