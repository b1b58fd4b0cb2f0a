package graft.expr

import org.apache.spark.sql.Row

/** Collision-free string encoding of a multi-column grouping key for
  * `groupByKey` call sites that fold per key (Ewma, RollingOls).
  *
  * Each field is emitted as a self-delimiting token — `n;` for null, else
  * `<charCount>:<chars>` — so no separator byte can collide with value
  * content ("a b","c" vs "a","b c"), null is distinct from the string
  * "null", and the source contains no raw control characters.
  */
object GroupKey {
  def of(r: Row, idxs: Seq[Int]): String = {
    val sb = new StringBuilder
    var k = 0
    while (k < idxs.length) {
      val i = idxs(k)
      if (r.isNullAt(i)) sb.append("n;")
      else {
        val s = String.valueOf(r.get(i))
        sb.append(s.length).append(':').append(s)
      }
      k += 1
    }
    sb.toString
  }
}
