"""Download + gunzip the GSE115978 CSVs (reference
scripts/download_jerby_arnon_csv_files.py). Requires network egress —
run on a connected machine, then point --rnaseq-dir at the output."""

from common import base_parser, setup

from hyperbolic_vae_tpu.data.jerby_arnon import download_csv_files

if __name__ == "__main__":
    parser = base_parser(__doc__)
    parser.add_argument("--out-dir", type=str, default="data/jerby_arnon")
    args = parser.parse_args()
    setup(args, "download_jerby_arnon")
    download_csv_files(args.out_dir)
    print(f"downloaded annotations.csv + tpm.csv to {args.out_dir}")
