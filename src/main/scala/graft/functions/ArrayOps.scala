package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

import graft.plans.IntersectCardSortedLong

/** Column wrappers for the native array expressions. */
object ArrayOps {

  /** |a ∩ b| for sorted, duplicate-free array<long> columns (codegen'd
    * merge walk — see graft.plans.IntersectCardSortedLong). */
  def intersectCardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCardSortedLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
