package graft.core

/** Scoring metric. Mirrors the reference's closed `Metric` enum
  * (/root/reference/src/vec.rs:11-16).
  *
  * Semantics preserved from the reference:
  *   - `Euclidean` is SQUARED L2 — no sqrt (vec_compute.rs:34-54).
  *   - Default top-k direction is metric-inferred (vec.rs:92-98):
  *     Euclidean → smallest-first, Cosine/DotProduct → largest-first.
  */
sealed trait Metric { def defaultTake: TakeType }
object Metric {
  case object Cosine extends Metric { val defaultTake: TakeType = TakeType.Max }
  case object Euclidean extends Metric { val defaultTake: TakeType = TakeType.Min }
  case object DotProduct extends Metric { val defaultTake: TakeType = TakeType.Max }

  /** L1 distance — on the reference's roadmap (README.md:204-215), not in
    * its shipped enum; a distance, so smallest-first like Euclidean. */
  case object Manhattan extends Metric { val defaultTake: TakeType = TakeType.Min }

  /** Element-wise Hamming distance over equal-length signature arrays
    * (binary/quantized codes) — reference roadmap (README.md:211); a
    * distance, so smallest-first. */
  case object Hamming extends Metric { val defaultTake: TakeType = TakeType.Min }

  /** Jaccard SET similarity of two array columns (distinct elements;
    * |A∩B| / |A∪B|, empty-union → 0) — reference roadmap (README.md:211).
    * A similarity, so largest-first; the one metric whose two sides may
    * legitimately differ in length (sets, not coordinates), so the
    * SearchPlan dimension guard does not apply. */
  case object Jaccard extends Metric { val defaultTake: TakeType = TakeType.Max }
}

/** Top-k direction (/root/reference/src/vec.rs:18-22). */
sealed trait TakeType
object TakeType {
  case object Min extends TakeType
  case object Max extends TakeType
}

/** Physical-index metadata persisted by `VecIndex.build` alongside the
  * parquet layout and carried by a loaded [[VecStore]]. Query-time
  * operators VALIDATE against it instead of trusting column presence —
  * e.g. an LSH search probes the persisted bucket column only when the
  * index was built with the same (table, nbits), and IVF probing requires
  * the build-time centroids (the reference stores its build config inside
  * the store the same way, meta.rs:48-60). */
final case class IndexMeta(
    lshBits: Option[Int] = None,
    lshTable: Int = 0,
    ivfCentroids: Option[Seq[(Int, Seq[Double])]] = None,
    /** Per-subspace PQ codebooks (`codebooks(s)(c)` = codeword `c` of
      * subspace `s`) when the index persisted a `pq_code` column. */
    pqCodebooks: Option[Seq[Seq[Seq[Double]]]] = None,
    /** Johnson–Lindenstrauss projection matrix (`rpMatrix(j)` = row
      * projecting input dim to output coordinate `j`) when the index
      * persisted an `rp_vec` column — queries project once driver-side
      * and score the slim persisted column instead of recomputing the
      * projection per scan. */
    rpMatrix: Option[Seq[Seq[Double]]] = None)

/** Score-filter comparison operators (/root/reference/src/vec.rs:24-31). */
sealed trait Cmp
object Cmp {
  case object Lt extends Cmp
  case object Lte extends Cmp
  case object Gt extends Cmp
  case object Gte extends Cmp
  case object Eq extends Cmp
}
