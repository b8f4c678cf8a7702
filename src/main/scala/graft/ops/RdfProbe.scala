package graft.ops

import org.apache.spark.sql.DataFrame

/** Probe-only exposure of Rdf private machinery (ProbeR21). */
object RdfProbe {
  def oriented(edges: DataFrame): DataFrame =
    Rdf.orientedTrianglesForProbe(edges)
  def support(tri: DataFrame): DataFrame = Rdf.edgeSupportForProbe(tri)
}
