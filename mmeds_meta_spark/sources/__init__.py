"""Sources & sinks: MMEDS metadata TSV (5-row header), feature tables,
QIIME mapping files, FASTQ barcode scans."""
