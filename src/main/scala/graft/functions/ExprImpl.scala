package graft.functions

import org.apache.spark.unsafe.types.UTF8String
import graft.operators.Dedup

/** Scalar helpers referenced from generated code. MUST remain a TOP-LEVEL
  * object: scalac emits static forwarder methods only for top-level
  * objects, and the Janino-compiled whole-stage code calls these as plain
  * Java statics (`graft.functions.ExprImpl.fnv1a64(...)`).
  */
object ExprImpl {

  def fnv1a64(s: UTF8String): Long = Dedup.fnv1a64(s.toString)

  def simhash64(s: UTF8String): Long = {
    val text = s.toString
    val votes = new Array[Int](64)
    text.toLowerCase.split("\\s+").foreach { t =>
      if (t.nonEmpty) {
        val h = Dedup.fnv1a64(t)
        var b = 0
        while (b < 64) {
          if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
          b += 1
        }
      }
    }
    var out = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) out |= (1L << b)
      b += 1
    }
    out
  }
}
