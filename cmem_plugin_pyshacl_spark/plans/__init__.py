"""Logical-plan builders: SHACL compilation/evaluation, RDFS inference
fixpoint, connected components, entity linking, and the end-to-end
build-then-validate pipeline."""
