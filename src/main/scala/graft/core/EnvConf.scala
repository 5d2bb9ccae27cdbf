package graft.core

/** Parses the `SPARK_GRAFT_CONF` deployment passthrough — a
  * `key=value;key=value` list applied to the session builder — so
  * cluster postures (shuffle codec, join preferences, scan split
  * sizes; optimization guide §9) are env-reachable without a code
  * edit, and config A/B experiments can be paired-measured without
  * recompiling. Malformed entries (no '=') are ignored rather than
  * failing the bench. */
object EnvConf {
  def apply(raw: Option[String]): Map[String, String] =
    raw.toSeq
      .flatMap(_.split(";"))
      .map(_.trim)
      .filter(_.contains("="))
      .map { kv =>
        val i = kv.indexOf('=')
        kv.substring(0, i).trim -> kv.substring(i + 1).trim
      }
      .filter { case (k, v) => k.nonEmpty && v.nonEmpty }
      .toMap
}
