// Fixture generator for the externally-produced progressive-JPEG test
// (VERDICT r8 item 2). Run with:  java scripts/MakeJpegFixtures.java tests/fixtures/jpeg
//
// Produces, from ONE deterministic synthetic RGB image:
//   imageio_seq.jpg   — baseline sequential (SOF0) via JDK ImageIO
//   imageio_prog.jpg  — progressive (SOF2) via setProgressiveMode(MODE_DEFAULT)
//   imageio_prog_rgb.bin — the JDK decoder's own RGB pixel dump of
//                          imageio_prog.jpg (row-major, 3 bytes/px)
//
// Provenance: the JDK's JPEG plugin (com.sun.imageio.plugins.jpeg) wraps
// the IJG libjpeg-derived native codec shipped with the JDK — an
// ecosystem encoder with no code shared with this repo. The progressive
// file uses libjpeg's standard multi-scan script (DC successive
// approximation + spectral-selection AC scans with refinements), so a
// repo decoder that misreads T.81 G.1.2 cannot pixel-match the
// sequential decode of the same coefficients.
//
// The image is seeded arithmetic (no RNG), so re-running this program on
// any JDK regenerates byte-identical inputs; the committed .jpg bytes
// are the fixture of record (JDK 17.x, Temurin, 2026-08-15).

import java.awt.image.BufferedImage;
import java.io.File;
import java.util.Iterator;
import javax.imageio.IIOImage;
import javax.imageio.ImageIO;
import javax.imageio.ImageWriteParam;
import javax.imageio.ImageWriter;
import javax.imageio.stream.ImageOutputStream;

public final class MakeJpegFixtures {
    public static void main(String[] args) throws Exception {
        File dir = new File(args.length > 0 ? args[0] : "tests/fixtures/jpeg");
        dir.mkdirs();
        int w = 64, h = 48;
        BufferedImage img = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB);
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                // deterministic texture: gradients + block sinusoids so
                // every 8x8 block has nonzero AC energy in several bands
                int r = (x * 4 + y) & 0xFF;
                int g = (int) (127.5 + 110.0 * Math.sin(x * 0.35) * Math.cos(y * 0.21)) & 0xFF;
                int b = ((x * x + 3 * y * y) / 7) & 0xFF;
                img.setRGB(x, y, (r << 16) | (g << 8) | b);
            }
        }
        write(img, new File(dir, "imageio_seq.jpg"), false);
        write(img, new File(dir, "imageio_prog.jpg"), true);

        // grayscale pair: single component, no chroma subsampling, so a
        // decoder comparison is pinned to entropy decode + IDCT alone
        // (the chroma upsampling filter is implementation-defined)
        BufferedImage gray = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_GRAY);
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                int v = (int) (127.5 + 100.0 * Math.sin(x * 0.29 + y * 0.11)
                               + 20.0 * ((x / 8 + y / 8) % 2)) & 0xFF;
                gray.getRaster().setSample(x, y, 0, v);
            }
        }
        write(gray, new File(dir, "imageio_gray_seq.jpg"), false);
        write(gray, new File(dir, "imageio_gray_prog.jpg"), true);
        BufferedImage gback = ImageIO.read(new File(dir, "imageio_gray_prog.jpg"));
        byte[] gpx = new byte[w * h];
        int gi = 0;
        for (int y = 0; y < h; y++) {
            for (int x = 0; x < w; x++) {
                gpx[gi++] = (byte) gback.getRaster().getSample(x, y, 0);
            }
        }
        java.nio.file.Files.write(new File(dir, "imageio_gray_prog_px.bin").toPath(), gpx);

        BufferedImage back = ImageIO.read(new File(dir, "imageio_prog.jpg"));
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
        java.nio.file.Files.write(new File(dir, "imageio_prog_rgb.bin").toPath(), rgb);
        System.out.println("wrote fixtures to " + dir);
    }

    static void write(BufferedImage img, File out, boolean progressive) throws Exception {
        Iterator<ImageWriter> it = ImageIO.getImageWritersByFormatName("jpeg");
        ImageWriter wr = it.next();
        ImageWriteParam p = wr.getDefaultWriteParam();
        p.setCompressionMode(ImageWriteParam.MODE_EXPLICIT);
        p.setCompressionQuality(0.85f);
        p.setProgressiveMode(progressive ? ImageWriteParam.MODE_DEFAULT
                                         : ImageWriteParam.MODE_DISABLED);
        try (ImageOutputStream os = ImageIO.createImageOutputStream(out)) {
            wr.setOutput(os);
            wr.write(null, new IIOImage(img, null, null), p);
        }
        wr.dispose();
    }
}
