"""Table layout management: partitioned/bucketed storage mirroring the
reference's partition + tablet-bucket model (SURVEY §1.2)."""
