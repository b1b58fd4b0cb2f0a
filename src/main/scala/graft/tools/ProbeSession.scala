package graft.tools

import org.apache.spark.sql.SparkSession

/** The measurement probes' shared `SPARK_GRAFT_MASTER` / executor-env
  * wiring (ScaleProbe, StreamScaleProbe, CcProbe) — ONE copy of the
  * round-12 executor contract so the next fix lands everywhere at once:
  *
  *   - `SPARK_GRAFT_MASTER=local-cluster[n,cores,memMB]` puts real
  *     executor JVMs and socket exchanges under the probe; default is
  *     in-process `local[cpus]`.
  *   - Executor processes inherit neither the launcher's classpath nor
  *     the JDK17 add-opens, so `SPARK_GRAFT_EXECUTOR_CLASSPATH` /
  *     `SPARK_GRAFT_EXECUTOR_OPTS` / `SPARK_GRAFT_EXECUTOR_MEM` are
  *     passed through explicitly.
  *   - The classpath must be ABSOLUTE, asserted here: executors resolve
  *     a relative `extraClassPath` against their WORKER dir, the app
  *     classes silently vanish, and the failure mode is not a clean
  *     ClassNotFound — codegen-inlined expressions keep working while
  *     plans whose expressions reach executors un-inlined die with
  *     SerializedLambda→MapPartitionsRDD.f ClassCastExceptions (the
  *     round-12 half-day incident, docs/SCALING.md caveats).
  */
object ProbeSession {

  /** Apply the master + executor-env contract to a builder. Callers add
    * their own probe-specific configs before/after; `getOrCreate` stays
    * with the caller.
    */
  def withMasterEnv(b0: SparkSession.Builder, cpus: String): SparkSession.Builder = {
    val master = sys.env.getOrElse("SPARK_GRAFT_MASTER", s"local[$cpus]")
    val classpath = sys.env.get("SPARK_GRAFT_EXECUTOR_CLASSPATH")
    classpath.foreach { cp =>
      require(new java.io.File(cp).isAbsolute,
        s"SPARK_GRAFT_EXECUTOR_CLASSPATH must be absolute, got: $cp")
    }
    var b = b0.master(master)
    classpath.foreach(cp =>
      b = b.config("spark.executor.extraClassPath", cp))
    sys.env.get("SPARK_GRAFT_EXECUTOR_OPTS").foreach(o =>
      b = b.config("spark.executor.extraJavaOptions", o))
    sys.env.get("SPARK_GRAFT_EXECUTOR_MEM").foreach(m =>
      b = b.config("spark.executor.memory", m))
    b
  }
}
