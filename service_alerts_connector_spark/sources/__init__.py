"""Sources and sinks (SURVEY §2.1 S1-S12).

Object-store parquet IO with retention + "latest" copies, the SharePoint-
shaped record source, and the JSON feed sinks.  Side-effecting sinks (email,
SNS, screenshots) live at the edges as foreachBatch/driver-side writers —
they are not query operators.
"""
