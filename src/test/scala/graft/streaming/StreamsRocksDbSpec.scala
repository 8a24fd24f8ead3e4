package graft.streaming

import org.scalatest.BeforeAndAfterAll

/** Every StreamsSpec ≡-batch suite re-run under the ROCKSDB state-store
  * provider (r13 directive #4). The provider is set on the shared
  * session BEFORE any of this suite's queries start (provider class is
  * read at query start) and restored after — test suites run
  * sequentially in the forked test JVM, so no other suite observes it.
  * The provider must be a pure state-STORAGE swap: same emitted rows,
  * same ≡-batch equalities, for every stateful operator family
  * (windowed/session aggs, dedup index, SCD2, interval join, sketch
  * maintenance, funnel, media dedup). */
class StreamsRocksDbSpec extends StreamsSpec with BeforeAndAfterAll {

  override def beforeAll(): Unit = {
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      Streams.RocksDbProviderClass)
    super.beforeAll()
  }

  override def afterAll(): Unit =
    try super.afterAll()
    finally spark.conf
      .unset("spark.sql.streaming.stateStore.providerClass")

  test("the RocksDB provider is actually engaged for this suite") {
    assert(spark.conf.get(
      "spark.sql.streaming.stateStore.providerClass")
      === Streams.RocksDbProviderClass)
  }
}
