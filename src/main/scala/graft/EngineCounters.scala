package graft

import graft.operators.Lake

/** The engine's fixed-cost counter channel, in one place: every driver-
  * side cost a lake query pays that wall-clock time alone cannot
  * decompose (log reads, scoped/forced DV jobs, path materializations,
  * eager checkpoint loads, inventory tasks, driver footer opens).
  * [[Bench]] records per-query DELTAS of these next to each timing, and
  * [[graft.tools.CounterGateSpec]] diffs the same deltas against a
  * checked-in golden — so "did this round seed extra work into a query"
  * is a mechanical diff, not a judgment call over noisy seconds. */
object EngineCounters {
  /** Names here are the golden map's vocabulary — adding a counter is
    * backward-compatible (absent in old goldens = ungated until the
    * golden is re-recorded). */
  def snapshot(): Map[String, Long] = Map(
    "logReads" -> Lake.logReads.get(),
    "dvScopedJobs" -> Lake.dvScopedJobs.get(),
    "dvForceJobs" -> Lake.dvForceJobs.get(),
    "pathForceJobs" -> Lake.pathForceJobs.get(),
    "eagerV3Loads" -> Lake.eagerV3Loads.get(),
    "inventoryListTasks" -> Lake.inventoryListTasks.get(),
    "footerDriverReads" -> Lake.footerDriverReads.get())

  /** Counter growth between a golden record and a live measurement:
    * every (query, counter) whose live value EXCEEDS the golden, plus
    * queries with no golden entry at all (a new query must declare its
    * cost by entering the golden in the same commit). Shrinkage is an
    * improvement, never a regression — the golden is a ceiling. */
  def regressions(golden: Map[String, Map[String, Long]],
      live: Map[String, Map[String, Long]]): Seq[String] =
    live.toSeq.sortBy(_._1).flatMap { case (q, counters) =>
      golden.get(q) match {
        case None => Seq(s"$q: no golden entry — declare its counter cost in the golden map")
        case Some(g) => counters.toSeq.sorted.collect {
          case (k, v) if v > g.getOrElse(k, 0L) =>
            s"$q: $k grew ${g.getOrElse(k, 0L)} -> $v"
        }
      }
    }
}
