package graft

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

/** Column wrappers for graft's native Catalyst expressions. */
package object functions {

  /** Rabin-Karp rolling hash of a string column's UTF-8 bytes → long.
    * Native expression with codegen — see [[RollingHash]]. */
  def rolling_hash(c: Column, base: Long = 31L, mod: Long = 1000000007L): Column =
    ColumnBridge.column(RollingHash(ColumnBridge.expression(c), base, mod))

  /** Codegen'd element-order dot product of two numeric arrays → double.
    * Bit-equal to the zip_with/aggregate fold it replaces — see
    * [[DotProduct]]. */
  def dot_product(a: Column, b: Column): Column =
    ColumnBridge.column(DotProduct(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
