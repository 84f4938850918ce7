"""Pipeline plans: orchestration, lineage, checkpoint/resume."""
