from .checkpoint import load_checkpoint, save_checkpoint
from .record import RecordStore, is_record_dir
from .writer import T2CsvWriter, default_output_path, read_t2_csv

__all__ = ["load_checkpoint", "save_checkpoint", "T2CsvWriter",
           "default_output_path", "read_t2_csv", "RecordStore",
           "is_record_dir"]
