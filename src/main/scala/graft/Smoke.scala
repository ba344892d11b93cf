package graft

import org.apache.spark.sql.SparkSession

/** Local smoke main mirroring the driver's t1 check: `SparkEntry.entry`
  * must return >0 rows on sf0.001. Also sanity-checks the schema DSL +
  * keccak topic0 against the canonical public ERC-20 Transfer hash.
  */
object Smoke {
  def main(args: Array[String]): Unit = {
    // DSL + keccak check (pure, no Spark)
    val t = model.EventSchema.parse(
      "Transfer(address indexed from, address indexed to, uint value)")
    val expected =
      "0xddf252ad1be2c89b69c2b068fc378daa952ba7f163c4a11628f55a4df523b3ef"
    assert(t.topic0Hex == expected, s"topic0 mismatch: ${t.topic0Hex}")
    println(s"TOPIC0_OK ${t.topic0Hex}")

    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val n = SparkEntry.entry(spark).count()
    println(s"ENTRY_ROWS=$n")
    assert(n > 0, "entry returned no rows")
    spark.stop()
  }
}
