package graft.ext

import graft.SparkSuite

class ResolveSpec extends SparkSuite {
  import spark.implicits._

  test("resolveComponents: transitive chains collapse to the component min") {
    // two components: {1-2, 2-3, 3-4} chain (diameter 3) and {10-11}
    val pairs = Seq((1L, 2L), (2L, 3L), (3L, 4L), (10L, 11L)).toDF("doc_a", "doc_b")
    val got = DedupOps.resolveComponents(pairs)
      .as[(Long, Long)].collect().toMap
    assert(got == Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 4L -> 1L, 10L -> 10L, 11L -> 10L))
  }

  test("resolveComponents keeps singletons out (only paired docs appear)") {
    val pairs = Seq((5L, 7L)).toDF("doc_a", "doc_b")
    assert(DedupOps.resolveComponents(pairs).count() == 2)
  }
}
