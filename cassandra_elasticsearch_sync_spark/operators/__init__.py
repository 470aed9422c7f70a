"""Relational operator tiers (SURVEY.md section 2.B-2.G)."""
