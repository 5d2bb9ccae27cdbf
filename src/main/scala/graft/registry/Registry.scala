package graft.registry

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Per-family query registry substrate. Each family object registers its
  * queries with [[RegistryBuilder.q]] and the matching DuckDB oracle SQL
  * with [[RegistryBuilder.o]] IMMEDIATELY BELOW it — the driver-contract
  * pair stays adjacent in source, and
  * [[graft.SparkEntry.queries]]/[[graft.SparkEntry.oracleSql]] are the
  * concatenation of every family (name collisions are a registration
  * bug and fail fast there). */
private[graft] trait Registry {
  protected val b: RegistryBuilder = new RegistryBuilder
  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = b.queries
  def oracles: Seq[(String, String)] = b.oracles
}

private[graft] final class RegistryBuilder {
  private val qs =
    scala.collection.mutable.ArrayBuffer.empty[(String, (SparkSession, String) => DataFrame)]
  private val os = scala.collection.mutable.ArrayBuffer.empty[(String, String)]
  def q(e: (String, (SparkSession, String) => DataFrame)): Unit = qs += e
  def o(e: (String, String)): Unit = os += e
  def queries: Seq[(String, (SparkSession, String) => DataFrame)] = qs.toSeq
  def oracles: Seq[(String, String)] = os.toSeq
}
