"""Custom sources: PySpark 4 Python DataSources for the reference's
paginated-REST and FTP-listing scans, plus staged-file readers."""
