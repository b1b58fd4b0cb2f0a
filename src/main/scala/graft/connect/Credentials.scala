package graft.connect

/** Credential/config resolution for connector construction — the
  * transport-agnostic half of the reference's client layer
  * (`pipelines/clients/alpaca.py:12-39`, `clients/slack.py:9-19`,
  * `clients/bear_lake.py:8-26`): settings come from the environment, and
  * a missing required key fails FAST at client construction with one
  * error that renders EVERY unset name (the reference interpolates each
  * variable with its value into a single RuntimeError, so an operator
  * sees the full list, not a fix-one-rerun-find-the-next loop).
  *
  * The HTTP SDKs themselves are environment-bound (zero-egress sandbox);
  * production plugs a real transport behind [[BarSource]] /
  * [[BrokerSource]] / [[Slack.notify]], and builds it from the map this
  * returns.
  */
object Credentials {

  /** All missing required keys at once, mirroring the reference's
    * multi-line "Environment variables not set" error shape.
    */
  final case class MissingCredentials(missing: Seq[String])
    extends RuntimeException(
      "Environment variables not set:\n" +
        missing.map(k => s"    $k: null").mkString("\n"))

  /** Resolve `required` ++ `optional` from `env` (pass `sys.env.get`
    * in production; specs pass a map). Throws [[MissingCredentials]]
    * listing every absent required key; absent optional keys (e.g. the
    * reference's `ALPACA_PAPER` paper-trading flag) are simply omitted
    * from the result.
    *
    * A key set to the EMPTY string counts as missing: the reference
    * gates on Python truthiness (`if not (api_key and secret_key)`,
    * `alpaca.py:24`), under which `ALPACA_API_KEY=""` fails fast rather
    * than passing construction and dying later in the transport.
    */
  def resolve(env: String => Option[String], required: Seq[String],
      optional: Seq[String] = Nil): Map[String, String] = {
    val found =
      (required ++ optional).flatMap(k => env(k).filter(_.nonEmpty).map(k -> _)).toMap
    val missing = required.filterNot(found.contains)
    if (missing.nonEmpty) throw MissingCredentials(missing)
    found
  }
}
