"""Python DataSource connectors (PySpark 4 extension point)."""
