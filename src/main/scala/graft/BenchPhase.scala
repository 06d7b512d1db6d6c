package graft

/** Process-local per-phase wall-clock stamps (bench diagnostics, not a
  * query operator). Two rounds running, the driver bench snapshot posted a
  * 3–4× outlier on ONE of the one-time PQ-build gates (vec11/vec12/vec15)
  * that collapsed on re-run — to adjudicate that without re-running, the
  * expensive one-time phases (codebook training, index save/load) stamp
  * themselves here and [[Bench]] snapshot-diffs the accumulator around
  * each gate, writing a per-gate phase breakdown into BENCH_DETAIL.json.
  * A future outlier row then SHOWS which phase absorbed the time (train =
  * CPU/stall window; save/load = disk contention) instead of earning
  * another filtered re-run.
  *
  * Counters share the map (unit "count" keys, suffix `_n`).
  */
object BenchPhase {
  private val acc =
    new java.util.concurrent.ConcurrentHashMap[String, java.util.concurrent.atomic.DoubleAdder]()

  private def adder(name: String) =
    acc.computeIfAbsent(name, _ => new java.util.concurrent.atomic.DoubleAdder)

  def time[A](phase: String)(f: => A): A = {
    val t0 = System.nanoTime()
    try f finally adder(phase).add((System.nanoTime() - t0) / 1e9)
  }

  def count(name: String): Unit = adder(name + "_n").add(1.0)

  /** Immutable snapshot — diff two of these around a gate for its share. */
  def snapshot(): Map[String, Double] = {
    val it = acc.entrySet().iterator()
    val b = Map.newBuilder[String, Double]
    while (it.hasNext) { val e = it.next(); b += e.getKey -> e.getValue.sum() }
    b.result()
  }
}
