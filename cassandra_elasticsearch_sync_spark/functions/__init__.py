"""Scalar function families (SURVEY.md section 2.H)."""
