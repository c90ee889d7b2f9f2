"""Pipeline plans: end-to-end DAG + lineage/resume."""
