package graft.plans

/** Z-order (Morton) range decomposition — the query-side half of q44's
  * layout primitive (reference semantics: multi-dimensional data skipping
  * for the events grid; layout built by
  * [[graft.operators.Relational]]'s zorderLayout + repartitionByRange).
  *
  * A z-clustered table prunes on EITHER dimension only if the reader can
  * translate an axis-aligned predicate into the set of z-key ranges that
  * can contain matches. This object does that translation at BUCKET
  * granularity: the layout writes one partition directory per z-prefix
  * bucket (the top `prefixBits` bits of the interleaved key — exactly the
  * file-level clustering Delta's OPTIMIZE ZORDER produces in its stats),
  * and [[bucketsFor]] returns the buckets whose axis-aligned node
  * rectangle intersects the query rectangle. Listing-time partition
  * pruning then skips every other directory — the numFiles metric drops
  * BEFORE any footer is opened.
  *
  * Cost model: the enumeration is O(2^prefixBits) — bounded by the BUCKET
  * count, never by the data (16 buckets here, a few thousand on a 100-TB
  * table). For very wide prefixes the same intersection test runs as a
  * quadtree descent (visit a node's four children only if it intersects),
  * which touches O(perimeter) nodes; at file-count scales the flat
  * enumeration is already negligible driver work.
  *
  * Bit convention (matches the `interleave_bits` kernel and the q44
  * oracle): z bit 2i is x bit i, z bit 2i+1 is y bit i.
  */
object ZOrder {

  /** De-interleave the even (x) bits of z. */
  private def evenBits(z: Long, nBits: Int): Long =
    (0 until nBits).foldLeft(0L)((acc, i) => acc | (((z >> (2 * i)) & 1L) << i))

  /** The z-prefix buckets whose node rectangle intersects
    * [xLo, xHi] × [yLo, yHi] over a 2^dimBits × 2^dimBits grid.
    * `prefixBits` must be even: each bucket's node is the axis-aligned
    * square of side 2^(dimBits - prefixBits/2) whose corner the bucket's
    * (y, x) prefix bits encode.
    */
  def bucketsFor(xLo: Long, xHi: Long, yLo: Long, yHi: Long,
                 dimBits: Int, prefixBits: Int): Seq[Long] = {
    require(prefixBits % 2 == 0 && prefixBits >= 2 && prefixBits <= 2 * dimBits,
      s"prefixBits must be even in [2, ${2 * dimBits}], got $prefixBits")
    val side = 1L << (dimBits - prefixBits / 2) // node square side length
    (0L until (1L << prefixBits)).filter { b =>
      // the bucket id is the top prefixBits of z — shift back up and
      // de-interleave to recover the node's (x, y) corner
      val z = b << (2 * dimBits - prefixBits)
      val nx = evenBits(z, dimBits)
      val ny = evenBits(z >> 1, dimBits)
      nx <= xHi && nx + side - 1 >= xLo && ny <= yHi && ny + side - 1 >= yLo
    }
  }
}
