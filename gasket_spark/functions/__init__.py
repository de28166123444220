"""Reusable column-expression packs (all JVM-side built-ins unless a
function explicitly says otherwise — UDFs are the slow path)."""
