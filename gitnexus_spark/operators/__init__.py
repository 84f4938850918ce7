"""Relational/graph operators: the four KG passes plus training-data ops."""
