package org.apache.spark

import org.apache.spark.util.collection.ExternalAppendOnlyMap

/** Bridge to Spark's spillable combiner map (`ExternalAppendOnlyMap` is
  * private[spark]) — the same structure RDD combineByKey uses for its
  * map-side combine: memory acquired through the TaskMemoryManager,
  * sorted spill files merged on iteration. Exposed behind a minimal
  * public trait so `graft` physical operators can aggregate per-key
  * state without unmanaged-memory OOM risk. */
object GraftSpillGlue {

  trait SpillableCombinerMap[K, V, C] {
    def insertAll(entries: Iterator[Product2[K, V]]): Unit
    def iterator: Iterator[(K, C)]
  }

  def externalMap[K, V, C](
      createCombiner: V => C,
      mergeValue: (C, V) => C,
      mergeCombiners: (C, C) => C): SpillableCombinerMap[K, V, C] =
    new SpillableCombinerMap[K, V, C] {
      private val m =
        new ExternalAppendOnlyMap[K, V, C](createCombiner, mergeValue, mergeCombiners)
      override def insertAll(entries: Iterator[Product2[K, V]]): Unit =
        m.insertAll(entries)
      override def iterator: Iterator[(K, C)] = m.iterator
    }
}
