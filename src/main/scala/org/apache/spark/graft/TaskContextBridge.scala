package org.apache.spark.graft

import org.apache.spark.TaskContext

/** Bridge to the `private[spark]` TaskContext thread-local setter.
  * [[graft.operators.PipeMapper]]'s stdin feeder thread consumes the
  * task's upstream iterator on a thread Spark did not create; Spark's
  * codegen iterators read `TaskContext.get()` (task metrics, memory
  * manager) via a thread-local, so the feeder must install the task's
  * context on itself first — exactly what Spark's own PipedRDD does
  * for its stdin thread (`rdd/PipedRDD.scala`, "new Thread ...
  * TaskContext.setTaskContext(context)"). */
object TaskContextBridge {
  def set(tc: TaskContext): Unit = TaskContext.setTaskContext(tc)
  def unset(): Unit = TaskContext.unset()
}
