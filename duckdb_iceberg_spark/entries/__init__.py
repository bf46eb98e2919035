"""Driver-contract entry families (split from __spark_entry__.py,
round 8). Import order matters: each family star-imports its
predecessor so the contract module sees one flat namespace."""
