package graft.run

import java.util.concurrent.atomic.AtomicLong

import scala.collection.concurrent.TrieMap

import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart, SparkListenerTaskEnd}

/** Task-level progress for the one distributed migrate job — the
  * Spark-first mapping of the reference's per-batch progress bar
  * (reference: migrator.py:297, `tqdm(data_iterator)`). There is no
  * driver-side batch loop to wrap here (the move is ONE job, SURVEY
  * §2.9 O3), so the unit of progress is the Spark task: the listener
  * counts tasks completed vs tasks planned across every stage of the
  * jobs in the migrate's job group, and emits at most one line per
  * `minIntervalMs` (plus one on each job start/end, so short moves
  * still show 0% → 100%).
  *
  * Scoped by job group id so concurrent queries on the same session do
  * not pollute the readout; registered only for the duration of the
  * write action (see [[Migrator]]). Stage retries re-plan tasks, so the
  * total is an estimate under failure — exactly tqdm's contract (a
  * monotone readout, not an accounting record; the authoritative row
  * count stays the `Observation` in Migrator).
  */
final class ProgressListener(jobGroup: String, out: String => Unit,
    minIntervalMs: Long = 2000L) extends SparkListener {

  private val jobs = TrieMap.empty[Int, Unit]
  private val stages = TrieMap.empty[Int, Unit]
  private val totalTasks = new AtomicLong(0L)
  private val doneTasks = new AtomicLong(0L)
  private val lastEmitMs = new AtomicLong(0L)

  /** Tasks completed / planned so far (visible for tests and callers
    * that render their own bar).
    */
  def snapshot: (Long, Long) = (doneTasks.get(), totalTasks.get())

  override def onJobStart(event: SparkListenerJobStart): Unit = {
    val group = Option(event.properties)
      .map(_.getProperty("spark.jobGroup.id")).orNull
    if (group == jobGroup) {
      jobs.put(event.jobId, ())
      event.stageInfos.foreach { si =>
        if (stages.putIfAbsent(si.stageId, ()).isEmpty)
          totalTasks.addAndGet(si.numTasks.toLong)
      }
      emit(force = true)
    }
  }

  override def onTaskEnd(event: SparkListenerTaskEnd): Unit =
    if (stages.contains(event.stageId)) {
      doneTasks.incrementAndGet()
      emit(force = false)
    }

  override def onJobEnd(event: SparkListenerJobEnd): Unit =
    if (jobs.contains(event.jobId)) emit(force = true)

  private def emit(force: Boolean): Unit = {
    val now = System.currentTimeMillis()
    val last = lastEmitMs.get()
    if ((force || now - last >= minIntervalMs) &&
        lastEmitMs.compareAndSet(last, now)) {
      val t = totalTasks.get()
      val d = doneTasks.get()
      val pct = if (t == 0L) 0L else d * 100L / t
      out(s"[migrate] tasks $d/$t ($pct%)")
    }
  }
}
