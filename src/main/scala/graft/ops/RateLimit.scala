package graft.ops

import org.apache.spark.sql.{Dataset, Encoder}

/** Per-partition rate limiting — the reference's APILimiter (D10).
  *
  * Reference: `APILimiter(url, delay).delay()` sleeps before each external
  * API call (/root/reference/bert/etl/__init__.py:262-277). The only Spark
  * stage that needs this is one calling an external service from executors;
  * the limiter must live PER PARTITION (executors share nothing), so the
  * global rate is maxPerSecond × numPartitions — size the repartition
  * accordingly (that is the distributed version of the reference's
  * single-process sleep).
  */
object RateLimit {

  /** Map rows through `f` at most `maxPerSecond` times per second per
    * partition (token-bucket with a monotonic clock). */
  def throttledMap[A, B: Encoder](ds: Dataset[A], maxPerSecond: Double)(f: A => B): Dataset[B] = {
    require(maxPerSecond > 0, "maxPerSecond must be positive")
    val intervalNanos = (1e9 / maxPerSecond).toLong
    ds.mapPartitions { it =>
      var nextAllowed = System.nanoTime()
      it.map { a =>
        val now = System.nanoTime()
        if (now < nextAllowed) {
          val ms = (nextAllowed - now) / 1000000
          val ns = ((nextAllowed - now) % 1000000).toInt
          Thread.sleep(ms, ns)
        }
        nextAllowed = math.max(now, nextAllowed) + intervalNanos
        f(a)
      }
    }
  }
}
