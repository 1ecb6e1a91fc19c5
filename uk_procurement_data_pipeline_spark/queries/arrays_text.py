"""(queries land here incrementally)"""
