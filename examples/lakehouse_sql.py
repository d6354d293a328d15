#!/usr/bin/env python
"""The versioned-table layer driven entirely through SQL strings: DDL,
CDC application, time travel, rollback, and maintenance.

    python examples/lakehouse_sql.py
"""

import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from lakeflow import LakehouseSQL, TableCatalog, get_session
from lakeflow.scratch import use_process_scratch


def main() -> None:
    use_process_scratch()  # pid-keyed temp scope, removed at exit
    spark = get_session("example-sql", master="local[8]", shuffle_partitions=8)
    lh = LakehouseSQL(
        spark, TableCatalog(spark, tempfile.mkdtemp(prefix="lh_sql_"))
    )

    print(lh.execute(
        "CREATE VERSIONED TABLE users AS "
        "SELECT id AS user_id, 'bronze' AS tier FROM range(5)"
    ))
    print(lh.execute(
        "INSERT INTO VERSIONED users "
        "SELECT id AS user_id, 'silver' AS tier FROM range(100, 103)"
    ))

    spark.sql(
        "SELECT 0 AS user_id, 2 AS seq, 'U' AS op, 'gold' AS tier "
        "UNION ALL SELECT 1, 1, 'D', NULL"
    ).createOrReplaceTempView("cdc_feed")
    print(lh.execute(
        "APPLY CHANGES INTO users FROM cdc_feed KEYS (user_id) "
        "SEQUENCE BY seq OPS op DELETE WHEN 'D'"
    ))

    print("latest:")
    lh.execute("SELECT * FROM users").orderBy("user_id").show()
    print("as of v1:")
    lh.execute("SELECT * FROM users FOR VERSION AS OF 1").orderBy("user_id").show()

    print("schema + constraint evolution (metadata-only):")
    print(lh.execute("ALTER TABLE users ADD COLUMN score double"))
    print(lh.execute("ALTER TABLE users ADD CONSTRAINT uid_ok CHECK (user_id >= 0)"))
    print(lh.execute("ALTER TABLE users RENAME COLUMN score TO rating"))
    print(lh.execute(
        "ALTER TABLE users ADD GENERATED COLUMN uid_bucket int AS (CAST(user_id % 10 AS INT))"
    ))

    print("merge-on-read DML (deletion vectors, no file rewrite):")
    print(lh.execute("DELETE FROM VERSIONED users WHERE user_id = 100 USING MERGE ON READ"))
    print(lh.execute(
        "UPDATE VERSIONED users SET tier = 'platinum' WHERE user_id = 0 "
        "USING MERGE ON READ"
    ))

    print("latest after MOR DML:")
    lh.execute("SELECT * FROM users").orderBy("user_id").show()

    print("z-order clustering (2-dim file skipping):")
    print(lh.execute("OPTIMIZE users ZORDER BY (user_id, rating)"))

    lh.execute("DESCRIBE HISTORY users").show(truncate=False)
    print(lh.execute("ROLLBACK TABLE users TO VERSION 2"))
    print(lh.execute("OPTIMIZE users"))
    print(lh.execute("VACUUM users RETAIN 2 SNAPSHOTS"))
    print("after rollback + maintenance:")
    lh.execute("SELECT count(*) AS n FROM users").show()
    spark.stop()


if __name__ == "__main__":
    main()
