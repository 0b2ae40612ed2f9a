"""Optional desktop GUI — three tabs (EMBED / EXTRACT / DETECT) mirroring
the reference app's workflow (ref: app_dct_svd_single.py:330-480): alpha
slider 0.01–0.30 synced with a spinbox (default 0.12), auto-filled
`<base>_stego.png` / `<base>_stego_meta.npz` / `<base>_wm.png` output paths
when a cover is chosen, password fields, and an error label per tab.

Uses tkinter (always present in CPython) so the framework carries no Qt
dependency; the CLI (dctsvd_tpu.cli) remains the primary interface and the
GUI is a thin shell over dctsvd_tpu.api.
"""

from __future__ import annotations

import os
import traceback


def main():  # pragma: no cover - interactive
    import tkinter as tk
    from tkinter import filedialog, ttk

    from dctsvd_tpu import api

    root = tk.Tk()
    root.title("DCT-SVD Watermarking (TPU)")
    nb = ttk.Notebook(root)
    nb.pack(fill="both", expand=True, padx=8, pady=8)

    def file_row(parent, label, var, save=False, filetypes=None):
        row = ttk.Frame(parent)
        row.pack(fill="x", pady=2)
        ttk.Label(row, text=label, width=14).pack(side="left")
        ttk.Entry(row, textvariable=var).pack(side="left", fill="x",
                                              expand=True)

        def browse():
            fn = (filedialog.asksaveasfilename if save
                  else filedialog.askopenfilename)(
                filetypes=filetypes or [("Images", "*.png *.jpg *.jpeg "
                                         "*.bmp"), ("All", "*.*")])
            if fn:
                var.set(fn)
        ttk.Button(row, text="Browse", command=browse).pack(side="left")
        return row

    # ---- EMBED tab
    et = ttk.Frame(nb)
    nb.add(et, text="EMBED")
    cover_v = tk.StringVar()
    wm_v = tk.StringVar()
    out_v = tk.StringVar()
    pwd_v = tk.StringVar()
    alpha_v = tk.DoubleVar(value=0.12)
    color_v = tk.BooleanVar(value=False)
    blocked_v = tk.BooleanVar(value=False)
    info_v = tk.StringVar(value="-")

    def on_cover_change(*_):
        p = cover_v.get()
        if p:
            base = os.path.splitext(p)[0]
            out_v.set(base + "_stego.png")
            x_stego_v.set(base + "_stego.png")
            x_meta_v.set(base + "_stego_meta.npz")
            x_out_v.set(base + "_wm.png")
    cover_v.trace_add("write", on_cover_change)

    file_row(et, "Host image", cover_v)
    file_row(et, "Watermark", wm_v)
    file_row(et, "Output", out_v, save=True)
    row = ttk.Frame(et)
    row.pack(fill="x", pady=2)
    ttk.Label(row, text="Password").pack(side="left")
    ttk.Entry(row, textvariable=pwd_v, show="*").pack(side="left")
    ttk.Label(row, text="Alpha").pack(side="left", padx=(12, 0))
    ttk.Scale(row, from_=0.01, to=0.30, variable=alpha_v,
              orient="horizontal", length=160).pack(side="left")
    ttk.Spinbox(row, from_=0.01, to=0.30, increment=0.01,
                textvariable=alpha_v, width=6).pack(side="left")
    ttk.Checkbutton(row, text="Color (RGB)",
                    variable=color_v).pack(side="left", padx=8)
    ttk.Checkbutton(row, text="Blocked (fast)",
                    variable=blocked_v).pack(side="left")
    ttk.Label(et, textvariable=info_v, wraplength=560).pack(fill="x")

    def do_embed():
        try:
            # The reference app refuses to embed without a password
            # (an empty field would silently select the unprotected open
            # mode — a security footgun); require it explicitly here.
            if not pwd_v.get():
                info_v.set("ERROR: password required (the open, "
                           "password-less mode is available via the "
                           "library API / CLI only).")
                return
            outp = out_v.get() or "stego.png"
            meta = os.path.splitext(outp)[0] + "_meta.npz"
            out, meta_p, ps, ss = api.embed(
                cover_v.get(), wm_v.get(), outp, meta,
                alpha=float(alpha_v.get()), color=color_v.get(),
                password=pwd_v.get(),
                method="blocked" if blocked_v.get() else "full")
            info_v.set(f"Saved: {out}\nMeta: {meta_p}\n"
                       f"PSNR: {ps:.2f}  SSIM: {ss:.4f}")
        except Exception as e:
            info_v.set("ERROR: " + str(e))
            traceback.print_exc()
    ttk.Button(et, text="EMBED WATERMARK", command=do_embed).pack(pady=6)

    # ---- EXTRACT tab
    xt = ttk.Frame(nb)
    nb.add(xt, text="EXTRACT")
    x_stego_v = tk.StringVar()
    x_meta_v = tk.StringVar()
    x_out_v = tk.StringVar()
    x_pwd_v = tk.StringVar()
    x_info_v = tk.StringVar(value="-")
    file_row(xt, "Stego image", x_stego_v)
    file_row(xt, "Meta (.npz)", x_meta_v,
             filetypes=[("NPZ", "*.npz")])
    file_row(xt, "Output", x_out_v, save=True)
    row = ttk.Frame(xt)
    row.pack(fill="x", pady=2)
    ttk.Label(row, text="Password").pack(side="left")
    ttk.Entry(row, textvariable=x_pwd_v, show="*").pack(side="left")
    ttk.Label(xt, textvariable=x_info_v, wraplength=560).pack(fill="x")

    def do_extract():
        try:
            out = api.extract(x_stego_v.get(), x_meta_v.get(),
                              x_out_v.get() or "wm.png",
                              password=x_pwd_v.get())
            x_info_v.set(f"Extracted watermark: {out}")
        except Exception as e:
            x_info_v.set("ERROR: " + str(e))
    ttk.Button(xt, text="EXTRACT (password required)",
               command=do_extract).pack(pady=6)

    # ---- DETECT tab
    dt = ttk.Frame(nb)
    nb.add(dt, text="DETECT")
    d_stego_v = tk.StringVar()
    d_meta_v = tk.StringVar()
    d_info_v = tk.StringVar(value="Score: -")
    file_row(dt, "Stego image", d_stego_v)
    file_row(dt, "Meta (.npz)", d_meta_v, filetypes=[("NPZ", "*.npz")])
    ttk.Label(dt, textvariable=d_info_v).pack(fill="x")

    def do_detect():
        try:
            ok, score = api.detect(d_stego_v.get(), d_meta_v.get())
            d_info_v.set(f"Score: {score:.4f} -> "
                         f"{'Watermarked' if ok else 'Not found'}")
        except Exception as e:
            d_info_v.set("ERROR: " + str(e))
    ttk.Button(dt, text="DETECT", command=do_detect).pack(pady=6)

    root.geometry("640x460")
    root.mainloop()


if __name__ == "__main__":  # pragma: no cover
    main()
