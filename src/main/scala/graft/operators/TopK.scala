package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Scalable per-group top-k selection.
  *
  * A `row_number().over(Window.partitionBy(group))` makes every group ONE
  * reducer partition — at corpus scale a hot stratum (e.g. the dominant
  * language in a mixing step) serializes through a single task. The
  * two-phase shape here bounds every task instead: phase 1 takes a
  * partial top-k per `(group, salt)` bucket — each reducer emits at most
  * k rows — and phase 2 merges the `k × saltBuckets` candidates per
  * group, which is O(k·buckets) however large the group is. Both phases
  * are ordinary hash aggregations (map-side combine applies to the
  * bucketed phase).
  */
object TopK {

  /** Top `k` rows per `groupCol`, ordered by `scoreCol` DESC with
    * ascending `idCol` as the deterministic tiebreak. Emits
    * `(groupCol, idCol, rank)` with rank 1..k. `idCol` must be a
    * non-negative numeric id (the tiebreak rides as its negation inside
    * the sort struct).
    */
  def topKPerGroup(df: DataFrame, groupCol: String, scoreCol: String,
      idCol: String, k: Int, saltBuckets: Int = 16): DataFrame = {
    require(k >= 1 && saltBuckets >= 1)
    // enforce the id precondition distributed + fail-fast (the
    // assertNoRemoved pattern): a null or negative id would silently
    // corrupt the (score, -id) tiebreak ordering instead of erroring
    val guarded = df.filter(
      assert_true(col(idCol).isNotNull && col(idCol) >= 0,
        lit(s"topKPerGroup: $idCol must be non-null and non-negative")).isNull)
    // struct sorts lexicographically: (score, -id) DESC ⇔ score desc,
    // id asc — exactly the window ordering this replaces
    val keyed = struct(col(scoreCol).as("s"), (-col(idCol)).as("nid"))
    guarded.groupBy(col(groupCol),
        pmod(xxhash64(col(idCol)), lit(saltBuckets)).as("salt"))
      .agg(slice(sort_array(collect_list(keyed), asc = false), 1, k).as("top"))
      .groupBy(col(groupCol))
      .agg(slice(sort_array(flatten(collect_list(col("top"))), asc = false),
        1, k).as("top"))
      .select(col(groupCol), posexplode(col("top")).as(Seq("pos", "t")))
      .select(
        (-col("t.nid")).cast("long").as(idCol),
        col(groupCol),
        (col("pos") + 1).cast("bigint").as("rank"))
  }
}
