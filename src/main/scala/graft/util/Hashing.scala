package graft.util

import java.nio.charset.StandardCharsets
import org.apache.spark.sql.catalyst.expressions.XXH64
import org.apache.spark.unsafe.Platform

/** Driver/oracle-side hashing that matches Spark's builtin `xxhash64(col)`
  * exactly (XxHash64 expression = XXH64 over the UTF-8 bytes, seed 42), so
  * pure-Scala generators and test oracles compute the same url_hash the
  * engine's Catalyst plan does. */
object Hashing extends Serializable {
  final val SparkSeed = 42L

  def xxhash64(s: String): Long = {
    val bytes = s.getBytes(StandardCharsets.UTF_8)
    XXH64.hashUnsafeBytes(bytes, Platform.BYTE_ARRAY_OFFSET, bytes.length, SparkSeed)
  }
}
