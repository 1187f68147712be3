"""End-to-end pipeline plans, checkpoint/lineage, table specs."""
