package graft

import org.apache.spark.sql.SparkSession

/** SPARK_GRAFT_CONF="k=v;k=v" — arbitrary session-conf overlay for
  * robustness sweeps (AQE off, exchange reuse off, odd partition counts…).
  * ONE parser for Verify and Bench: segments are trimmed (a space after
  * ';' must not silently turn a real key into an unknown one, faking a
  * green sweep under default configs) and malformed segments fail loudly
  * with the offending text.
  */
object SessionConf {
  def overlay(builder: SparkSession.Builder): SparkSession.Builder = {
    sys.env.get("SPARK_GRAFT_CONF").foreach {
      _.split(";").map(_.trim).filter(_.nonEmpty).foreach { kv =>
        kv.split("=", 2) match {
          case Array(k, v) if k.trim.nonEmpty =>
            builder.config(k.trim, v.trim)
          case _ =>
            throw new IllegalArgumentException(
              s"SPARK_GRAFT_CONF segment is not k=v: '$kv'")
        }
      }
    }
    builder
  }
}
