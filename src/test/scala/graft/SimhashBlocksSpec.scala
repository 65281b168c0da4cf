package graft

import org.scalatest.funsuite.AnyFunSuite

import graft.queries.Dedup

/** Theorems behind q_dedup_simhash_blocks' exact-recall candidate
  * scheme — pure Scala (no Spark session): the mask family and the
  * pigeonhole recall guarantee, checked by brute force at both
  * corpus-derived geometries, plus a measurement of what the classic
  * 4×15 band heuristic misses at hamming 4–5. */
class SimhashBlocksSpec extends AnyFunSuite {

  private val full60 = (1L << 60) - 1

  test("corpus-derived block count follows the integer ladder") {
    assert(Dedup.simhashBlocksB(1L) == 6)
    assert(Dedup.simhashBlocksB(1024L) == 6)
    assert(Dedup.simhashBlocksB(1025L) == 10)
    assert(Dedup.simhashBlocksB(1L << 30) == 10)
    assert(Dedup.simhashBlocksB((1L << 30) + 1) == 12)
    assert(Dedup.simhashBlocksB(1L << 35) == 12)
    assert(Dedup.simhashBlocksB((1L << 35) + 1) == 15)
  }

  test("mask family: C(B,5) distinct masks, each keeping B-5 disjoint blocks") {
    for (bB <- Seq(6, 10, 12, 15)) {
      val masks = Dedup.simhashBlockMasks(bB)
      val expected = ((bB - 4) to bB).product / 120 // C(bB,5)
      assert(masks.size == expected, s"B=$bB")
      assert(masks.distinct.size == masks.size, s"B=$bB masks must be distinct")
      val width = 60 / bB
      masks.foreach { m =>
        assert((m & ~full60) == 0, "mask stays within 60 bits")
        assert(java.lang.Long.bitCount(m) == (bB - 5) * width,
          s"B=$bB mask keeps exactly B-5 blocks")
        // mask is a union of whole blocks: every block is all-ones or all-zero
        (0 until bB).foreach { j =>
          val block = ((1L << width) - 1) << (j * width)
          val got = m & block
          assert(got == 0L || got == block, s"B=$bB block $j must be whole")
        }
      }
    }
  }

  test("pigeonhole recall is EXACT at hamming <= 5 (brute force, both gate geometries)") {
    val rnd = new scala.util.Random(23)
    for (bB <- Seq(6, 10)) {
      val masks = Dedup.simhashBlockMasks(bB)
      def candidates(a: Long, b: Long): Boolean =
        masks.exists(m => (a & m) == (b & m))
      val base = Array.fill(60)(rnd.nextLong() & full60)
      // planted distances 1..5 MUST collide on some mask; 6..8 MAY
      // collide (blocks only bound recall) but the verify filter kills
      // them — assert recall, and assert the filter is what precision
      // rests on
      def flip(h: Long, k: Int): Long = {
        var out = h
        rnd.shuffle((0 until 60).toList).take(k).foreach(b => out ^= 1L << b)
        out
      }
      for (h <- base; d <- 1 to 5) {
        val other = flip(h, d)
        assert(candidates(h, other),
          s"B=$bB: a hamming-$d pair must share a masked key (pigeonhole)")
      }
      // distances beyond 60 - keyBits can never be hidden by masking
      // alone; sanity: two fresh random signatures are (overwhelmingly)
      // not candidates at B=10 (30-bit keys)
      if (bB == 10) {
        val misses = (0 until 200).count { _ =>
          val a = rnd.nextLong() & full60
          val b = rnd.nextLong() & full60
          candidates(a, b)
        }
        assert(misses == 0, "random 60-bit signatures must not collide on 30-bit keys")
      }
    }
  }

  test("the 4x15 band heuristic misses hamming 4-5 pairs the blocks catch") {
    // the measured gap the new query closes: place one differing bit in
    // each of the four 15-bit bands (hamming 4 <= 5, a true near-dup by
    // the query's own threshold) — no band matches, so the band join
    // can NEVER emit the pair; every block geometry catches it
    val rnd = new scala.util.Random(31)
    var bandMisses = 0
    val trials = 500
    (0 until trials).foreach { _ =>
      val a = rnd.nextLong() & full60
      val b = a ^ (1L << rnd.nextInt(15)) ^ (1L << (15 + rnd.nextInt(15))) ^
        (1L << (30 + rnd.nextInt(15))) ^ (1L << (45 + rnd.nextInt(15)))
      val bandHit = (0 until 4).exists(k => ((a >> (k * 15)) & 32767) == ((b >> (k * 15)) & 32767))
      assert(!bandHit, "one flip per band defeats every band")
      val blocksHit = Dedup.simhashBlockMasks(10).exists(m => (a & m) == (b & m))
      assert(blocksHit, "the block scheme must catch the hamming-4 pair")
      if (!bandHit) bandMisses += 1
    }
    assert(bandMisses == trials)
  }
}
