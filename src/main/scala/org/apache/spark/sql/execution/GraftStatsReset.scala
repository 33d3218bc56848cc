package org.apache.spark.sql.execution

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.classic.{Dataset => CDataset}

/** Package-placed shim (the standard technique for Spark extensions that
  * need a `private[sql]` member): rebuilds a checkpointed Dataset's
  * LogicalRDD without its preserved `originStats`/`originConstraints`.
  * See graft.util.Ckpt for why (iterative plans compound the preserved
  * sizeInBytes multiplicatively until stats estimation dominates runtime).
  */
object GraftStatsReset {
  def dropOriginStats(df: DataFrame): DataFrame = df match {
    case c: CDataset[_] =>
      c.queryExecution.analyzed match {
        case lr: LogicalRDD =>
          CDataset.ofRows(c.sparkSession,
            new LogicalRDD(lr.output, lr.rdd, lr.outputPartitioning,
              lr.outputOrdering, lr.isStreaming, lr.stream)(
              c.sparkSession, None, None))
        case _ => df
      }
    case _ => df
  }
}
