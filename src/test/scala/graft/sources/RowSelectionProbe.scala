package graft.sources.druid

/** Test-side window into the package-private row-selection logic. */
object RowSelectionProbe {
  def build(segment: graft.format.DruidSegment,
            part: DruidInputPartition): Array[Int] =
    RowSelection.build(segment, part)
}
