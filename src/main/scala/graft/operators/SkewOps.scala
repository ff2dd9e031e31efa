package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew mitigation for shuffle joins (SURVEY §4 / the 100 TB checklist's
  * "salting for skew").
  *
  * A shuffle equi-join routes every row of one key to one task; a hot key
  * (one user with billions of events) serializes that task while the rest
  * of the cluster idles. Salting rewrites the join so the hot key's rows
  * spread over `salts` sub-keys:
  *
  *   - the (big, skewed) left side gains a per-row salt in [0, salts);
  *   - the (smaller) right side is replicated once per salt value;
  *   - the join key becomes (key, salt), so each original key fans out
  *     across `salts` tasks, bounding any task at ~hotKeyRows/salts.
  *
  * The result is row-identical to the plain inner join — salt never
  * changes which (left, right) row pairs match, only where they meet.
  * Cost: the right side shuffles `salts`× its size; pick `salts` ≈ the
  * hot key's row count / target task size, and keep the genuinely small
  * dimension case on `broadcast()` (no shuffle at all) — salting is for
  * the middle regime where neither side broadcasts and the key histogram
  * is lopsided. (With AQE on, `skewJoin` does a runtime version of this
  * split; this utility is the explicit, planner-independent form.)
  */
object SkewOps {

  /** Inner equi-join on `key` (present in BOTH frames, same name) with the
    * left side salted `salts` ways and the right side replicated.
    */
  def saltedJoin(left: DataFrame, right: DataFrame, key: String,
                 salts: Int): DataFrame = {
    require(salts > 0, "salts must be positive")
    // withColumn would silently overwrite (and drop() then delete) a
    // caller's column of the same name, breaking row-identity
    require(!left.columns.contains("_salt") && !right.columns.contains("_salt"),
      "inputs must not already carry a _salt column")
    // any per-row value works as salt — matching pairs are preserved for
    // every salt assignment; a round-robin id spreads evenly by construction
    val l = left.withColumn("_salt",
      pmod(monotonically_increasing_id(), lit(salts.toLong)).cast("int"))
    val r = right.withColumn("_salt",
      explode(array((0 until salts).map(lit): _*)))
    l.join(r, Seq(key, "_salt"), "inner").drop("_salt")
  }
}
