from .routed_parquet import RoutedParquetDatasink

__all__ = ["RoutedParquetDatasink"]
