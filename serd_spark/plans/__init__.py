"""End-to-end pipeline plans: resumable KG construction with
snapshot + lineage semantics."""
