package graft.gd

/** A featurized document: sparse TF-IDF vector + numeric label.
  * `indices` sorted ascending; `values` aligned. Sparse because tweets
  * touch ~15 of 10k vocabulary slots — dense rows at 100 TB would be
  * ~60× the memory/shuffle volume (SURVEY.md §4).
  */
case class SparseDoc(
    id: String,
    label: Double,
    indices: Array[Int],
    values: Array[Double]) {

  def dot(coef: Array[Double]): Double = {
    var s = 0.0
    var k = 0
    while (k < indices.length) {
      s += values(k) * coef(indices(k))
      k += 1
    }
    s
  }
}
