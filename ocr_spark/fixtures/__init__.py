"""Hand-specified extraction fixtures (wild-HTML corpus)."""
