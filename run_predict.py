"""Prediction CLI — same flags and modes as the reference ``run_predict.py``
(`/root/reference/run_predict.py:8-43`): predict_file / predict_dir /
predict_csv with a pretrained checkpoint (.tar, reference format).

Inputs: WAV and FLAC always; mp3/ogg/m4a/opus/... when the host has the
FFmpeg libraries (see README "Input formats").

Examples:
  python run_predict.py --mode predict_file --pretrained_model weights/nisqa.tar --deg /path/to/wav --output_dir out/
  python run_predict.py --mode predict_dir  --pretrained_model weights/nisqa.tar --data_dir /folder/with/wavs --output_dir out/
  python run_predict.py --mode predict_csv  --pretrained_model weights/nisqa.tar --csv_file f.csv --csv_deg column_name --data_dir dir --output_dir out/
"""

import argparse

from nisqa_tpu.model import NisqaTPU


def parse_args():
    parser = argparse.ArgumentParser()
    parser.add_argument("--mode", required=True, type=str,
                        help="prediction mode: predict_file | predict_dir | predict_csv")
    parser.add_argument("--pretrained_model", required=True, type=str,
                        help="checkpoint .tar to load (path relative to the working directory)")
    parser.add_argument("--deg", type=str, help="degraded speech wav to score (predict_file mode)")
    parser.add_argument("--data_dir", type=str, help="directory whose wavs are scored (predict_dir mode)")
    parser.add_argument("--output_dir", type=str, help="where NISQA_results.csv is written")
    parser.add_argument("--csv_file", type=str, help="dataset csv listing the files to score (predict_csv mode)")
    parser.add_argument("--csv_deg", type=str, help="csv column holding each file's name or path")
    parser.add_argument("--num_workers", type=int, default=0, help="host-side decode thread count")
    parser.add_argument("--bs", type=int, default=1, help="inference batch size")
    parser.add_argument("--ms_channel", type=int, help="which channel to use for stereo inputs")
    args = vars(parser.parse_args())

    if args["mode"] == "predict_file":
        if args["deg"] is None:
            raise ValueError("--deg argument with path to input file needed")
    elif args["mode"] == "predict_dir":
        if args["data_dir"] is None:
            raise ValueError("--data_dir argument with folder with input files needed")
    elif args["mode"] == "predict_csv":
        if args["csv_file"] is None:
            raise ValueError("--csv_file argument with csv file name needed")
        if args["csv_deg"] is None:
            raise ValueError("--csv_deg argument with csv column name of the filenames needed")
        if args["data_dir"] is None:
            args["data_dir"] = ""
    else:
        raise NotImplementedError("--mode given not available")

    args["tr_bs_val"] = args["bs"]
    args["tr_num_workers"] = args["num_workers"]
    return args


if __name__ == "__main__":
    nisqa = NisqaTPU(parse_args())
    nisqa.predict()
