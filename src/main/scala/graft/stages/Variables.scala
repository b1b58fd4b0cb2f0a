package graft.stages

/** Pipeline constants (reference `pipelines/variables.py:1-8`). */
object Variables {
  /** Factor ETF tickers (reference `variables.py:3`). */
  val Factors: Seq[String] = Seq("MTUM", "QUAL", "USMV", "VLUE", "SPY")
  /** Rolling regression / std window (reference `variables.py:4`). */
  val Window = 252
  /** EWMA half-life (reference `factor_model_flow.py:87`). */
  val HalfLife = 60.0
  /** Information coefficient for alpha = IC * score * idio_vol
    * (reference `variables.py:6`). */
  val IC = 0.05
  /** Target annualized active risk (reference `variables.py:8`). */
  val TargetActiveRisk = 0.05
  /** Reversal signal lookback (reference `reversal_flow.py:23`). */
  val ReversalLookback = 21
  /** Signal name (reference `reversal_flow.py:148`). */
  val SignalName = "reversal"
}
