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
    * The child is aggregated to one array per join key FIRST, then joined
    * to the parent on the parent's key columns — so the grouping key is
    * only the (declared or join-derived) PK, never the whole parent row.
    * Against a real 180-column parent (VBAK-shaped) the old
    * join-then-groupBy-every-parent-column formulation shuffled full
    * parent×child rows keyed by the entire row; this shape shuffles the
    * child once by its key and the parent once by its narrow PK (and the
    * aggregated child side is broadcast-able when small). Childless
    * parents nest `[]`; arrays are sorted for deterministic output.
    *
    * @param joinCond   (parentCol, childCol) equality pairs — the parent
    *                   side must be unique per key (the mapping's PK
    *                   contract, `S4HanaTableMapping.java:134-139`)
    * @param childCols  child columns to carry into the nested struct
    *                   (defaults to all non-join columns)
    */
  def nest(parent: DataFrame, child: DataFrame,
      joinCond: Seq[(String, String)], field: String,
      childCols: Seq[String] = Nil): DataFrame = {
    val carried = if (childCols.nonEmpty) childCols
      else child.columns.toSeq.filterNot(joinCond.map(_._2).contains)
    val childStruct = struct(carried.map(n => col(n).alias(n)): _*)
    // rename child keys to the parent's names so the equi-join below is a
    // plain USING join (no duplicate output columns to drop)
    val nested = child
      .groupBy(joinCond.map { case (pk, ck) => col(ck).alias(pk) }: _*)
      .agg(sort_array(collect_list(childStruct)).alias(field))
    val elemType = nested.schema(field).dataType
    parent.join(nested, joinCond.map(_._1), "left_outer")
      .withColumn(field,
        coalesce(col(field), array().cast(elemType)))
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
    *
    * @param broadcastKeys poll windows touch few keys, so the changed-key
    *   set broadcasts by default (the parent side never shuffles); a
    *   BACKFILL window touching most keys would OOM that broadcast — pass
    *   false there and the semi-join shuffles both sides instead (same
    *   escape hatch as `Cdc.foldChanges`).
    */
  def impactedParents(parent: DataFrame, changedChildRows: DataFrame,
      joinCond: Seq[(String, String)], broadcastKeys: Boolean = true): DataFrame = {
    val keys = changedChildRows
      .select(joinCond.map { case (pk, ck) => col(ck).alias(pk) }: _*)
      .distinct()
    val keySide = if (broadcastKeys) broadcast(keys) else keys
    parent.join(keySide, joinCond.map(_._1), "left_semi")
  }

  /** The full recreate-on-child-change step ([[impactedParents]] composed
    * with [[nest]]): given the current parent and child TABLE STATE and the
    * batch of changed child rows, emit the freshly nested objects of
    * exactly the impacted parents — the upsert batch a keyed store merges
    * to bring the materialized objects current (the reference recreates
    * and re-publishes the whole order object whenever any item row
    * changes, `S4HanaProducer.java:56-61`, `:407-410`).
    *
    * Both the parent and the child are cut down to the impacted keys by a
    * semi-join BEFORE the nest, so the per-batch cost is
    * O(impacted parents + their child rows), never a full re-nest: the
    * nest's child groupBy shuffles only surviving rows. The changed-key
    * set is broadcast to both semi-joins by default (a poll window touches
    * few keys; its scan runs once per side — cache `changedChildRows`
    * first if that scan is expensive); pass `broadcastKeys = false` for
    * backfill-sized windows, where both semi-joins shuffle instead.
    */
  def rebuild(parent: DataFrame, child: DataFrame,
      changedChildRows: DataFrame, joinCond: Seq[(String, String)],
      field: String, childCols: Seq[String] = Nil,
      broadcastKeys: Boolean = true): DataFrame = {
    val keys = changedChildRows
      .select(joinCond.map { case (pk, ck) => col(ck).alias(pk) }: _*)
      .distinct()
    nestForKeys(parent, child, keys, joinCond, field, childCols,
      broadcastKeys)
  }

  /** [[rebuild]] for a CDC window carrying BOTH parent-side and
    * child-side changes (reference: `S4HanaProducer.java:56-61,407-410` —
    * a changed parent row recreates its object exactly like a changed
    * child row does): the impacted set is the UNION of the two change
    * key sets, and every impacted object re-nests once from the
    * post-batch state of both tables — a parent hit from both sides is
    * rebuilt once, not twice. Parent DELETES are not rebuilt (a deleted
    * parent has no object to recreate): exclude them from `parent` and
    * fold them to store deletes downstream.
    */
  def rebuildBoth(parent: DataFrame, child: DataFrame,
      changedParentRows: DataFrame, changedChildRows: DataFrame,
      joinCond: Seq[(String, String)], field: String,
      childCols: Seq[String] = Nil,
      broadcastKeys: Boolean = true): DataFrame = {
    val keys = changedChildRows
      .select(joinCond.map { case (pk, ck) => col(ck).alias(pk) }: _*)
      .unionByName(
        changedParentRows.select(joinCond.map(_._1).map(col): _*))
      .distinct()
    nestForKeys(parent, child, keys, joinCond, field, childCols,
      broadcastKeys)
  }

  /** Re-nest exactly the parents named by `keys` (parent-key columns)
    * from the current state of both tables — the shared core of
    * [[rebuild]]/[[rebuildBoth]]. Both semi-joins broadcast the key set
    * by default: an impact set is change-batch-sized, never corpus-sized.
    */
  private def nestForKeys(parent: DataFrame, child: DataFrame,
      keys: DataFrame, joinCond: Seq[(String, String)], field: String,
      childCols: Seq[String], broadcastKeys: Boolean): DataFrame = {
    def side(k: DataFrame) = if (broadcastKeys) broadcast(k) else k
    val impactedParent = parent.join(side(keys), joinCond.map(_._1), "left_semi")
    val childKeys = keys
      .select(joinCond.map { case (pk, ck) => col(pk).alias(ck) }: _*)
    val impactedChild = child.join(side(childKeys), joinCond.map(_._2), "left_semi")
    nest(impactedParent, impactedChild, joinCond, field, childCols)
  }
}
