"""Pipeline plans: topological task runner and medallion pipeline graphs."""
