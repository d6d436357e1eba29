// Fixture generator for the externally-produced GIF test. Run with:
//   java scripts/MakeGifFixtures.java tests/fixtures/gif
//
// Produces, from ONE deterministic 61x37 indexed image with an explicit
// 64-entry palette (TYPE_BYTE_INDEXED — lossless GIF encode, no
// quantizer in the loop):
//   imageio_seq.gif        — non-interlaced, JDK ImageIO GIF writer
//   imageio_interlaced.gif — interlaced (setProgressiveMode(MODE_DEFAULT))
//   imageio_rgb.bin        — the JDK decoder's RGB dump of the
//                            interlaced file (row-major, 3 bytes/px)
//
// Provenance: the JDK's GIF plugin (com.sun.imageio.plugins.gif) — an
// ecosystem LZW encoder with no code shared with this repo. Palette
// indexing is lossless, so a correct decoder must match the dump
// byte-for-byte (no rounding envelope, unlike JPEG's IDCT).
// Deterministic arithmetic throughout; committed bytes are the fixture
// of record (JDK 17.x, Temurin, 2026-08-15).

import java.awt.image.BufferedImage;
import java.awt.image.IndexColorModel;
import java.io.File;
import java.util.Iterator;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;

public final class MakeGifFixtures {
    public static void main(String[] args) throws Exception {
        File dir = new File(args.length > 0 ? args[0] : "tests/fixtures/gif");
        dir.mkdirs();
        int w = 61, h = 37, n = 64;
        byte[] r = new byte[n], g = new byte[n], b = new byte[n];
        for (int i = 0; i < n; i++) {
            r[i] = (byte) ((i * 4 + 3) & 0xFF);
            g[i] = (byte) ((i * 7 + 11) & 0xFF);
            b[i] = (byte) (255 - i * 3);
        }
        IndexColorModel cm = new IndexColorModel(8, n, r, g, b);
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, cm);
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                // runs + texture so LZW builds a real dictionary
                int v = (x / 5 + y * 3 + ((x * y) % 7)) % n;
                img.getRaster().setSample(x, y, 0, v);
            }
        }
        write(img, new File(dir, "imageio_seq.gif"), false);
        write(img, new File(dir, "imageio_interlaced.gif"), true);

        BufferedImage back = ImageIO.read(new File(dir, "imageio_interlaced.gif"));
        byte[] rgb = new byte[w * h * 3];
        int i = 0;
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                int p = back.getRGB(x, y);
                rgb[i++] = (byte) (p >> 16);
                rgb[i++] = (byte) (p >> 8);
                rgb[i++] = (byte) p;
            }
        }
        java.nio.file.Files.write(new File(dir, "imageio_rgb.bin").toPath(), rgb);
        System.out.println("wrote GIF fixtures to " + dir);
    }

    static void write(BufferedImage img, File out, boolean interlaced) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("gif");
        ImageWriter wr = it.next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setProgressiveMode(interlaced ? ImageWriteParam.MODE_DEFAULT
                                        : ImageWriteParam.MODE_DISABLED);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(out)) {
            wr.setOutput(os);
            wr.write(null, new IIOImage(img, null, null), p);
        }
        wr.dispose();
    }
}
