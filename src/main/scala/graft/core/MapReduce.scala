package graft.core

import org.apache.spark.sql.{Dataset, Encoder}

/** The reference engine's entire user-facing API is one trait — the
  * map/reduce contract of Dean & Ghemawat, "MapReduce: Simplified Data
  * Processing on Large Clusters" (OSDI 2004)
  * (reference: src/map_reduce.rs:4-7):
  *
  * {{{
  * trait MapReducer {
  *   fn map(&self, key: String, value: String) -> Vec<(String, String)>;
  *   fn reduce(&self, key: String, value: Vec<String>) -> String;
  * }
  * }}}
  *
  * This is the typed, generalized re-expression: keys and values are
  * arbitrary encodable types instead of `String`, and `reduce` folds an
  * iterator so a group never has to be materialized in memory (the
  * reference builds a whole `HashMap<String, Vec<String>>` per reduce task,
  * src/worker.rs:163-177).
  */
trait MapReducer[K, V, K2, V2, OUT] extends Serializable {
  def map(key: K, value: V): IterableOnce[(K2, V2)]
  def reduce(key: K2, values: Iterator[V2]): OUT
}

/** A MapReducer whose reduction is an associative merge of values. Spark can
  * then run map-side partial aggregation before the shuffle (the classic
  * MapReduce "combiner"), which the reference lacks entirely — its reduce
  * scope is a single input chunk because map output is never repartitioned
  * by key (src/task_manager.rs:63-70 promotes each map task to a reduce task
  * over its own intermediate file only).
  */
trait AssociativeMapReducer[K, V, K2, V2] extends MapReducer[K, V, K2, V2, V2] {
  def combine(a: V2, b: V2): V2
  final def reduce(key: K2, values: Iterator[V2]): V2 = values.reduce(combine)
}

object MapReduce {

  /** Execute a MapReducer job: flatMap (map phase, src/worker.rs:113-133) →
    * shuffle by key (replacing the reference's per-task intermediate files,
    * src/utils.rs:64-77) → per-group fold (reduce phase,
    * src/worker.rs:135-161). Grouping is GLOBAL — the semantics WordCount
    * visibly intends — not the reference's accidental per-chunk scope.
    */
  def run[K, V, K2, V2, OUT](input: Dataset[(K, V)], job: MapReducer[K, V, K2, V2, OUT])(implicit
      kvEnc: Encoder[(K2, V2)],
      kEnc: Encoder[K2],
      outEnc: Encoder[(K2, OUT)]): Dataset[(K2, OUT)] =
    input
      .flatMap { case (k, v) => job.map(k, v) }
      .groupByKey(_._1)
      .mapGroups { (k, it) => (k, job.reduce(k, it.map(_._2))) }

  /** Associative variant: `reduceGroups` compiles to an Aggregator with
    * partial (map-side) merge, so only one partially-combined record per
    * key per partition crosses the shuffle — the right shape at 100 TB.
    */
  def runAssociative[K, V, K2, V2](input: Dataset[(K, V)], job: AssociativeMapReducer[K, V, K2, V2])(implicit
      kvEnc: Encoder[(K2, V2)],
      kEnc: Encoder[K2]): Dataset[(K2, V2)] =
    input
      .flatMap { case (k, v) => job.map(k, v) }
      .groupByKey(_._1)
      .reduceGroups((a, b) => (a._1, job.combine(a._2, b._2)))
      .map { case (_, kv) => kv }
}

/** Behavior port of the reference's only job (src/implm/word_count.rs:5-25):
  * whitespace tokenize, emit (word, 1), sum per word — global scope.
  */
object WordCount extends AssociativeMapReducer[String, String, String, Long] {
  def map(key: String, value: String): IterableOnce[(String, Long)] =
    value.split("\\s+").iterator.filter(_.nonEmpty).map(w => (w, 1L))
  def combine(a: Long, b: Long): Long = a + b
}
