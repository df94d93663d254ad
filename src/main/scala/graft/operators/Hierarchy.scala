package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

import graft.catalog.{Relation, TableMapping}

/** Hierarchical business objects (J4): a parent row with child rows nested
  * as an array-of-structs field — the reference's `relations[{detail,
  * schemafield, joincondition}]` model (test fixture
  * `src/test/resources/tmp/…SO.Header.json`, join editor
  * `ui5/controller/EditBusinessObject.controller:1-140`).
  *
  * Scale note: the groupBy shuffles child rows by the parent key once; with
  * both sides bucketed/partitioned by that key the exchange disappears.
  * Child arrays are sorted for deterministic output.
  */
object Hierarchy {

  /** Nest `child` rows under `field` on the parent.
    *
    * @param joinCond (parentCol, childCol) equality pairs
    * @param childCols child columns to carry into the nested struct
    *                  (defaults to all non-join columns)
    */
  def nest(parent: DataFrame, child: DataFrame,
      joinCond: Seq[(String, String)], field: String,
      childCols: Seq[String] = Nil): DataFrame = {
    val p = parent.alias("p")
    val c = child.alias("c")
    val cond = joinCond.map { case (pk, ck) => col(s"p.$pk") === col(s"c.$ck") }
      .reduce(_ && _)
    val carried = if (childCols.nonEmpty) childCols
      else child.columns.toSeq.filterNot(joinCond.map(_._2).contains)
    val childStruct = struct(carried.map(n => col(s"c.$n").alias(n)): _*)
    val parentCols = parent.columns.toSeq.map(n => col(s"p.$n").alias(n))
    // collect_list skips nulls → a parent with no children gets [] rather
    // than [null-struct] from the unmatched outer row
    val childOrNull = when(col(s"c.${joinCond.head._2}").isNotNull, childStruct)
    p.join(c, cond, "left_outer")
      .groupBy(parentCols: _*)
      .agg(sort_array(collect_list(childOrNull)).alias(field))
  }

  /** Build the nested object a [[TableMapping]] with relations describes:
    * the mapping's projection plus one nested array field per relation.
    */
  def build(mapping: TableMapping, parent: DataFrame,
      children: Map[String, DataFrame]): DataFrame =
    mapping.relations.foldLeft(mapping.project(parent)) { (acc, rel) =>
      val child = children.getOrElse(rel.detail,
        throw new IllegalArgumentException(s"missing child table ${rel.detail}"))
      nest(acc, child, rel.joincondition.map(jc => jc.left -> jc.right),
        rel.schemafield)
    }

  /** Recompute-parent-on-child-change (the reference's table directory:
    * a change in the item table forces the order object to be recreated,
    * `S4HanaProducer.java:56-61`, `:407-410`): the parent keys whose nested
    * object must be rebuilt for a batch of changed child rows.
    */
  def impactedParents(parent: DataFrame, changedChildRows: DataFrame,
      joinCond: Seq[(String, String)]): DataFrame = {
    val keys = changedChildRows
      .select(joinCond.map { case (pk, ck) => col(ck).alias(pk) }: _*)
      .distinct()
    parent.join(broadcast(keys), joinCond.map(_._1), "left_semi")
  }
}
