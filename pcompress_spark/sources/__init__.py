from .tables import load_table, transcripts_path

__all__ = ["load_table", "transcripts_path"]
