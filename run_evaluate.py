"""Evaluation / conformance script — mirrors the reference ``run_evaluate.py``.

Evaluates a trained model on a labeled dataset CSV: runs prediction, then
per-db / per-condition metrics with a first-order mapping. If a 'csv_con'
CSV with per-condition MOS is given, both CSVs need a 'con' column. Doubles
as the install conformance test, like the reference documents
(`/root/reference/run_evaluate.py:5-11`).

Edit the args dict below (paths to the NISQA Corpus) before running.
"""

from nisqa_tpu.model import NisqaTPU

if __name__ == "__main__":
    args = {
        "mode": "predict_csv",
        "pretrained_model": "/root/reference/weights/nisqa.tar",
        "data_dir": "/path/to/NISQA_Corpus",
        "output_dir": "/path/to/NISQA_Corpus",
        "csv_file": "NISQA_corpus_file.csv",
        "csv_con": "NISQA_corpus_con.csv",
        "csv_deg": "filepath_deg",
        "csv_mos_val": "mos",
        "tr_num_workers": 6,
        "tr_bs_val": 40,
        "ms_channel": None,
    }

    nisqa = NisqaTPU(args)
    nisqa.predict()
    nisqa.evaluate(mapping="first_order", do_print=True, do_plot=True)
