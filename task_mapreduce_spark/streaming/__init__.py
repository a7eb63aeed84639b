"""Structured Streaming operators (populated in later milestones)."""
