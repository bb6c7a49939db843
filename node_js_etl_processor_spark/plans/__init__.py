"""Pipeline orchestration (the reference's runETL control plane)."""
