package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.graft.ColumnBridge

import graft.plans.{IntersectCardSortedLong, L1DistInt}

/** Column wrappers for the native array expressions. */
object ArrayOps {

  /** |a ∩ b| for sorted array<long> columns (codegen'd merge walk — see
    * graft.plans.IntersectCardSortedLong). On sorted-with-duplicates
    * input the walk counts min multiplicity per value, i.e. BAG
    * intersection cardinality (what the q-gram count filter needs);
    * duplicate-free input gives plain set intersection. */
  def intersectCardSorted(a: Column, b: Column): Column =
    ColumnBridge.column(IntersectCardSortedLong(ColumnBridge.expression(a), ColumnBridge.expression(b)))

  /** Σ|a_i - b_i| for array<int> columns, short side zero-padded
    * (codegen'd — see graft.plans.L1DistInt). */
  def l1DistInt(a: Column, b: Column): Column =
    ColumnBridge.column(L1DistInt(ColumnBridge.expression(a), ColumnBridge.expression(b)))
}
