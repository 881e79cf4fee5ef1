package org.apache.spark

/** Test-only bridge: `SparkContext.checkpointDir` is `private[spark]`,
  * and PinSpec must RESTORE the unset state after exercising the
  * reliable-checkpoint path — the test session is shared across suites,
  * and leaving a dir set would silently flip every later pin to disk.
  */
object GraftTestHooks {
  def clearCheckpointDir(sc: SparkContext): Unit = sc.checkpointDir = None
}
