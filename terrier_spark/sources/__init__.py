"""Table loaders (reference analog: SeqScan/CSVScan plan nodes,
/root/reference/src/include/planner/plannodes/{seq_scan,csv_scan}_plan_node.h
— here just spark.read with explicit schemas)."""
